package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQuery

import graft.mr.{JobProgress, JobProgressListener, JobStage, JobState}

/** The reference's `getJobState` poll surface for a stream (SURVEY §1.4).
  *
  * A streaming query is an endless sequence of MapReduce jobs — one per
  * micro-batch. Spark's `StreamExecution` runs every micro-batch's jobs
  * under a job group named by the query's `runId`, so the per-batch
  * MAP → SHUFFLE → REDUCE machine is the same job-group-scoped
  * [[JobProgressListener]] the batch API uses, re-armed at each batch
  * boundary (the reference's machine is per-job; a new batch is a new
  * job). Once the query has processed everything available (no trigger
  * active, no data available, at least one batch done) the state is the
  * reference poll-loop's terminal `(REDUCE, 100)`
  * (`SampleClient.cpp:85-94`) — which is also the final state of a
  * finite `Trigger.AvailableNow` replay.
  */
final class StreamProgress private[streaming] (spark: SparkSession, q: StreamingQuery) {
  // ONE listener for the query's whole lifetime: micro-batch boundaries
  // re-arm the phase machine inside the listener (keyed on the jobs'
  // `streaming.sql.batchId` property), so the getter below is a pure
  // read — observed state can never depend on polling frequency, and no
  // bus events are lost to a detach/attach window.
  private val listener: JobProgressListener =
    JobProgress.attach(spark, Some(q.runId.toString))

  /** Snapshot — safe to call from any thread, including after the query
    * terminated. Side-effect-free.
    */
  def state: JobState = {
    val caughtUp = q.lastProgress != null &&
      !q.status.isTriggerActive && !q.status.isDataAvailable
    if (caughtUp) JobState(JobStage.Reduce, 100f) else listener.state
  }

  /** Event-driven record of every state the machine passed through,
    * across all micro-batches — identical no matter how (or whether)
    * `state` was polled.
    */
  def history: List[JobState] = listener.history

  /** `closeJobHandle` for the adapter: release the listener. */
  def close(): Unit = JobProgress.detach(spark, listener)
}

object StreamProgress {
  /** Attach the reference-shaped progress facade to a running query. */
  def attach(spark: SparkSession, q: StreamingQuery): StreamProgress =
    new StreamProgress(spark, q)
}
