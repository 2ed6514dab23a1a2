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
  private var listener: JobProgressListener =
    JobProgress.attach(spark, Some(q.runId.toString))
  private var seenBatch = -1L

  /** Snapshot — safe to call from any thread, including after the query
    * terminated.
    */
  def state: JobState = synchronized {
    val lp = Option(q.lastProgress)
    val caughtUp = lp.isDefined && !q.status.isTriggerActive && !q.status.isDataAvailable
    if (caughtUp) JobState(JobStage.Reduce, 100f)
    else {
      lp.foreach { p =>
        if (p.batchId > seenBatch) {
          // batch boundary: a fresh machine for the new micro-batch job
          seenBatch = p.batchId
          JobProgress.detach(spark, listener)
          listener = JobProgress.attach(spark, Some(q.runId.toString))
        }
      }
      listener.state
    }
  }

  /** `closeJobHandle` for the adapter: release the listener. */
  def close(): Unit = synchronized(JobProgress.detach(spark, listener))
}

object StreamProgress {
  /** Attach the reference-shaped progress facade to a running query. */
  def attach(spark: SparkSession, q: StreamingQuery): StreamProgress =
    new StreamProgress(spark, q)
}
