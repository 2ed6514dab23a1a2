package graft.mr

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.spark.sql.{Dataset, Encoder, SparkSession}

/** The reference's job lifecycle, faithfully:
  *
  *  - `MapReduce.submit` ↔ `startMapReduceJob` (`MapReduceFramework.h:18-20`)
  *    — returns immediately with a handle while the job runs.
  *  - `JobHandle.state` ↔ `getJobState` (`MapReduceFramework.h:22`) —
  *    poll `{stage, percentage}` from any thread.
  *  - `JobHandle.waitForJob()` ↔ `waitForJob` (`MapReduceFramework.h:21`)
  *    — blocks until completion; safe to call repeatedly/concurrently
  *    (the reference guards this with `waitForJobMutex`,
  *    `MapReduceFramework.cpp:204-209`; a Future gives it for free).
  *  - `JobHandle.close()` ↔ `closeJobHandle` (`MapReduceFramework.h:23`)
  *    — waits, then releases the listener.
  *
  * Output lands in the caller-supplied buffer semantics of the reference
  * (`OutputVec`) as the returned array; order is unspecified, as there
  * (`MapReduceFramework.cpp:181-184`).
  */
final class JobHandle[R] private[mr] (
    spark: SparkSession,
    listener: JobProgressListener,
    result: Future[R]) {

  /** Snapshot of the 4-stage machine — `getJobState`. */
  def state: JobState = listener.state

  /** Block until done — `waitForJob`. Idempotent. */
  def waitForJob(): R = Await.result(result, Duration.Inf)

  /** `closeJobHandle`: wait, then detach the progress listener — the
    * listener is released even when the job failed.
    */
  def close(): R =
    try waitForJob()
    finally JobProgress.detach(spark, listener)
}

object JobHandle {
  private implicit val ec: ExecutionContext = ExecutionContext.global

  /** `startMapReduceJob`: launch asynchronously under a unique job group
    * (so the handle's progress listener sees only this job, even with
    * concurrent submissions on the same session), return the handle.
    */
  private[mr] def launch[I, K2, V2, K3, V3](input: Dataset[I])(
      map: I => IterableOnce[(K2, V2)])(
      reduce: (K2, Iterator[V2]) => IterableOnce[(K3, V3)])(implicit
      e2: Encoder[(K2, V2)],
      ek: Encoder[K2],
      e3: Encoder[(K3, V3)]): JobHandle[Array[(K3, V3)]] = {
    val spark = input.sparkSession
    val group = s"graft-mr-${java.util.UUID.randomUUID()}"
    val listener = JobProgress.attach(spark, Some(group))
    val fut = Future {
      // setJobGroup is thread-local; the collect runs on this thread
      spark.sparkContext.setJobGroup(group, "graft MapReduce job", interruptOnCancel = false)
      try MapReduce.run(input)(map)(reduce).collect()
      finally spark.sparkContext.clearJobGroup()
    }
    new JobHandle(spark, listener, fut)
  }
}
