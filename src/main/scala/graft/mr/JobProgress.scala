package graft.mr

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

/** SparkListener adapter: shuffle-map stages ↔ MAP (`MapReduceFramework
  * .cpp:155-158` sets MAP when workers start), the stage boundary ↔
  * SHUFFLE (`cpp:100-133`), the result stage ↔ REDUCE (`cpp:139-142`).
  * Percentage = completed tasks / total tasks of the current phase — the
  * same monotone contract as the reference's per-row counters
  * (`cpp:85,187`), at task granularity.
  *
  * Usage mirrors `startMapReduceJob`/`getJobState`/`waitForJob`
  * (`MapReduceFramework.h:18-24`): attach, run the action (actions are
  * blocking — Spark's `waitForJob` is implicit), poll `state` from any
  * thread, then `detach`.
  */
final class JobProgressListener extends SparkListener {
  @volatile private var current: JobState = JobState(JobStage.Undefined, 0f)
  private var seenMapStage = false
  private val stageTasks = scala.collection.mutable.Map.empty[Int, (Int, Int)] // id -> (done, total)
  private val stageIsFinal = scala.collection.mutable.Map.empty[Int, Boolean]
  private val resultStages = scala.collection.mutable.Set.empty[Int]

  def state: JobState = current

  override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
    // The result (reduce-side) stage of a job is the last in its stage
    // list; all earlier ones are shuffle-map stages.
    if (e.stageIds.nonEmpty) resultStages += e.stageIds.max
  }

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = synchronized {
    val info = e.stageInfo
    // A stage that produces shuffle output is a map phase; the job's
    // result stage is the reduce phase.
    val isMapSide = !resultStages.contains(info.stageId)
    stageTasks(info.stageId) = (0, math.max(info.numTasks, 1))
    stageIsFinal(info.stageId) = !isMapSide
    if (isMapSide) {
      seenMapStage = true
      current = JobState(JobStage.Map, 0f)
    } else if (seenMapStage) {
      // Crossing the Exchange: the reference's single-threaded shuffle
      // happens between map completion and first reduce call.
      current = JobState(JobStage.Shuffle, 100f)
    } else {
      current = JobState(JobStage.Map, 0f) // single-stage job: treat as map
    }
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
    stageTasks.get(e.stageId).foreach { case (done, total) =>
      val d = done + 1
      stageTasks(e.stageId) = (d, total)
      val pct = 100f * d / total
      val stage =
        if (stageIsFinal.getOrElse(e.stageId, false)) JobStage.Reduce else JobStage.Map
      // monotone within a stage; never step backwards across stages
      if (stage.id >= current.stage.id) current = JobState(stage, pct)
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
    if (stageIsFinal.getOrElse(e.stageInfo.stageId, false))
      current = JobState(JobStage.Reduce, 100f)
  }
}

object JobProgress {
  /** Run `action` with a fresh listener attached; return (result, final
    * observed state, every state observed by `poll`).
    */
  def attach(spark: SparkSession): JobProgressListener = {
    val l = new JobProgressListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  def detach(spark: SparkSession, l: JobProgressListener): Unit =
    spark.sparkContext.removeSparkListener(l)
}
