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

/** SparkListener adapter for the reference's phase machine:
  *
  *  - stages that WRITE shuffle output (`StageInfo.shuffleDepId` defined —
  *    dependency metadata, not the old RDD-name heuristic) ↔ MAP
  *    (`MapReduceFramework.cpp:155-158`); percentage = successful tasks /
  *    total of the phase.
  *  - the data movement between map and reduce ↔ SHUFFLE
  *    (`cpp:100-133` runs between map completion and the first reduce
  *    call, updating its own percentage as keys drain). Here the shuffle
  *    read happens inside reduce-side tasks, so SHUFFLE percentage =
  *    cumulative shuffle records READ by reduce-side tasks over records
  *    WRITTEN by map-side tasks — a real 0→100 ramp, not a jump.
  *  - reduce-side task completions after the shuffle read is fully
  *    drained ↔ REDUCE (`cpp:139-142`).
  *
  * Percentages are clamped monotone non-decreasing within a stage and the
  * stage strictly advances (AQE may schedule several physical stages per
  * phase; task retries would otherwise overshoot). Every distinct state
  * is also appended to [[history]], so tests can assert on transitions
  * (e.g. an intermediate SHUFFLE observation) without racing a poller.
  *
  * When `jobGroup` is set, only jobs submitted under that Spark job group
  * are observed — [[MapReduce.submit]] tags each handle's job with a
  * unique group so concurrent jobs (or unrelated session activity) cannot
  * corrupt one another's state machine. With `jobGroup = None` the
  * listener observes everything on the session: single-job usage only.
  */
final class JobProgressListener(jobGroup: Option[String] = None) extends SparkListener {
  @volatile private var current: JobState = JobState(JobStage.Undefined, 0f)
  private val states = scala.collection.mutable.ArrayBuffer.empty[JobState]
  private val stageTasks = scala.collection.mutable.Map.empty[Int, (Int, Int)] // id -> (done, total)
  private val stageWritesShuffle = scala.collection.mutable.Map.empty[Int, Boolean]
  private val trackedStages = scala.collection.mutable.Set.empty[Int]
  private var sawWriter = false
  private var recordsWritten = 0L
  private var recordsRead = 0L
  private var lastBatchId: Option[String] = None

  def state: JobState = current

  /** Every distinct state the machine has passed through, in order.
    * Cumulative across micro-batch resets, so a poller's frequency can
    * never change what is recorded — the sequence is event-driven.
    */
  def history: List[JobState] = synchronized(states.toList)

  /** Re-arm the phase machine for a new job while keeping the listener
    * (and its cumulative [[history]]) attached — called internally at
    * each micro-batch boundary. Detaching/re-attaching instead would
    * open a window where bus events are silently dropped.
    */
  private def resetMachine(): Unit = {
    current = JobState(JobStage.Undefined, 0f)
    states += current
    stageTasks.clear()
    stageWritesShuffle.clear()
    trackedStages.clear()
    sawWriter = false
    recordsWritten = 0L
    recordsRead = 0L
  }

  /** Never step the machine backwards: stage strictly advances, and the
    * percentage within a stage is clamped non-decreasing and to <= 100.
    */
  private def advance(stage: JobStage.Value, pct0: Float): Unit = {
    val pct = math.min(pct0, 100f)
    if (stage.id > current.stage.id ||
      (stage.id == current.stage.id && pct > current.percentage)) {
      current = JobState(stage, pct)
      states += current
    }
  }

  override def onJobStart(e: SparkListenerJobStart): Unit = synchronized {
    val props = Option(e.properties)
    val group = props.flatMap(p => Option(p.getProperty("spark.jobGroup.id")))
    if (jobGroup.isEmpty || jobGroup == group) {
      // Structured Streaming tags every micro-batch's jobs with its batch
      // id (StreamExecution.BATCH_ID_KEY): a new id means a new logical
      // MapReduce job, so the phase machine re-arms — event-driven, with
      // the listener staying on the bus (no detach/attach event loss).
      val batch = props.flatMap(p => Option(p.getProperty("streaming.sql.batchId")))
      if (batch.isDefined && batch != lastBatchId) {
        if (lastBatchId.isDefined) resetMachine()
        lastBatchId = batch
      }
      trackedStages ++= e.stageIds
    }
  }

  private def tracked(stageId: Int): Boolean =
    jobGroup.isEmpty || trackedStages.contains(stageId)

  /** A stage that writes no shuffle output after some stage in the group
    * has written one is reduce-side; a writer stage (or a stage of a
    * shuffle-free job) is map-side.
    */
  private def reduceSide(stageId: Int): Boolean =
    sawWriter && !stageWritesShuffle.getOrElse(stageId, false)

  override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = synchronized {
    val info = e.stageInfo
    if (!tracked(info.stageId)) return
    val writes = org.apache.spark.scheduler.GraftSchedulerAccess.writesShuffle(info)
    stageTasks(info.stageId) = (0, math.max(info.numTasks, 1))
    stageWritesShuffle(info.stageId) = writes
    if (writes) sawWriter = true
    if (reduceSide(info.stageId))
      // between map completion and reduce submission AQE has fully
      // materialized the map output; the read-side ramp starts at 0
      advance(JobStage.Shuffle, 0f)
    else advance(JobStage.Map, 0f)
  }

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = synchronized {
    if (e.reason != Success) return // failed/killed attempts are not progress
    stageTasks.get(e.stageId).foreach { case (done, total) =>
      val d = done + 1
      stageTasks(e.stageId) = (d, total)
      val pct = 100f * d / total
      val metrics = Option(e.taskMetrics)
      if (reduceSide(e.stageId)) {
        metrics.foreach(m => recordsRead += m.shuffleReadMetrics.recordsRead)
        if (recordsRead < recordsWritten)
          // shuffle data still in flight: this is SHUFFLE progress
          advance(JobStage.Shuffle, 100f * recordsRead / recordsWritten)
        else advance(JobStage.Reduce, pct)
      } else {
        metrics.foreach(m => recordsWritten += m.shuffleWriteMetrics.recordsWritten)
        advance(JobStage.Map, pct)
      }
    }
  }

  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = synchronized {
    if (reduceSide(e.stageInfo.stageId))
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
