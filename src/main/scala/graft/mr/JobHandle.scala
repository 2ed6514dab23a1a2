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

  /** Run any Spark action asynchronously under a unique job group (so the
    * handle's progress listener sees only this job, even with concurrent
    * submissions on the same session) and hand back the lifecycle handle.
    */
  private[mr] def launchAction[R](spark: SparkSession)(action: => R): JobHandle[R] = {
    val group = s"graft-mr-${java.util.UUID.randomUUID()}"
    val listener = JobProgress.attach(spark, Some(group))
    val fut = Future {
      // setJobGroup is thread-local; the action runs on this thread
      spark.sparkContext.setJobGroup(group, "graft MapReduce job", interruptOnCancel = false)
      try action
      finally spark.sparkContext.clearJobGroup()
    }
    new JobHandle(spark, listener, fut)
  }

  /** `startMapReduceJob` with the reference's caller-owned output buffer
    * semantics: the result array is the `OutputVec`.
    */
  private[mr] def launch[I, K2, V2, K3, V3](input: Dataset[I])(
      map: I => IterableOnce[(K2, V2)])(
      reduce: (K2, Iterator[V2]) => IterableOnce[(K3, V3)])(implicit
      e2: Encoder[(K2, V2)],
      ek: Encoder[K2],
      e3: Encoder[(K3, V3)]): JobHandle[Array[(K3, V3)]] =
    launchAction(input.sparkSession)(MapReduce.run(input)(map)(reduce).collect())

  /** Sink variant for outputs too large for driver memory: identical job,
    * but the reduce output streams to a parquet directory executor-side
    * (the reference's `OutputVec` is driver memory by contract,
    * `MapReduceFramework.cpp:181-184` — fine at its scale, wrong at
    * 100 TB). The handle resolves to the written row count.
    */
  private[mr] def launchWrite[I, K2, V2, K3, V3](input: Dataset[I], path: String)(
      map: I => IterableOnce[(K2, V2)])(
      reduce: (K2, Iterator[V2]) => IterableOnce[(K3, V3)])(implicit
      e2: Encoder[(K2, V2)],
      ek: Encoder[K2],
      e3: Encoder[(K3, V3)]): JobHandle[Long] = {
    val spark = input.sparkSession
    launchAction(spark) {
      MapReduce.run(input)(map)(reduce).write.mode("overwrite").parquet(path)
      spark.read.parquet(path).count()
    }
  }
}
