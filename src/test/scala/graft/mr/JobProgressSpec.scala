package graft.mr

import graft.SparkSpec

/** Progress-API parity (FIXTURES.md §2 progress fixture): observed states
  * must be a subsequence of UNDEFINED→MAP→SHUFFLE→REDUCE, percentage
  * monotone within a stage, terminating at (REDUCE, 100) — the sample
  * client's poll-loop exit condition (`SampleClient.cpp:85-94`).
  */
class JobProgressSpec extends SparkSpec {

  test("listener reproduces the 4-stage JobState machine") {
    import spark.implicits._
    val listener = JobProgress.attach(spark)
    val observed = scala.collection.mutable.ArrayBuffer.empty[JobState]
    @volatile var polling = true
    val poller = new Thread(() => {
      while (polling) {
        observed += listener.state
        Thread.sleep(2)
      }
    })
    poller.start()
    try {
      val input = spark.createDataset(1 to 10000)
      MapReduce.run(input)(i => Iterator((i % 100, 1L)))((k, vs) =>
        Iterator((k, vs.sum))).collect()
    } finally {
      // listener events arrive on an async bus: wait (bounded) for the
      // terminal state instead of assuming it landed already
      var waited = 0
      while (listener.state != JobState(JobStage.Reduce, 100f) && waited < 5000) {
        Thread.sleep(10); waited += 10
      }
      observed += listener.state
      polling = false
      poller.join()
      JobProgress.detach(spark, listener)
    }
    val states = observed.toList
    // stage ids must be non-decreasing (subsequence of the 4-stage machine)
    val stageIds = states.map(_.stage.id)
    assert(stageIds === stageIds.sorted, "stages regressed")
    // percentage monotone within each stage
    states.groupBy(_.stage).foreach { case (_, ss) =>
      val ps = ss.map(_.percentage)
      assert(ps === ps.sorted, "percentage regressed within a stage")
    }
    // terminal state is (REDUCE, 100) — the poll-loop exit condition
    assert(states.last.stage === JobStage.Reduce)
    assert(states.last.percentage === 100f)
  }

  test("SHUFFLE reports intermediate percentage (reference cpp:104-107 contract)") {
    import spark.implicits._
    val listener = JobProgress.attach(spark)
    // AQE would coalesce this tiny shuffle into one reduce task, which
    // reads 100% of the map output at once — pin multiple reduce tasks
    // so the mid-shuffle window exists to be observed
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoalesce = spark.conf.get(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    try {
      // 4 shuffle partitions in the test session, 100 keys: each
      // reduce-side task reads ~1/4 of the map output, so the first
      // reduce task completions observe shuffle-read < shuffle-write
      // and must be reported as SHUFFLE progress strictly inside (0,100)
      val input = spark.createDataset(1 to 10000)
      MapReduce.run(input)(i => Iterator((i % 100, 1L)))((k, vs) =>
        Iterator((k, vs.sum))).collect()
      var waited = 0
      while (listener.state != JobState(JobStage.Reduce, 100f) && waited < 5000) {
        Thread.sleep(10); waited += 10
      }
      val history = listener.history
      val shuffle = history.filter(_.stage == JobStage.Shuffle)
      assert(shuffle.exists(s => s.percentage > 0f && s.percentage < 100f),
        s"no intermediate SHUFFLE state in $history")
      // the machine still never steps backwards
      val ids = history.map(_.stage.id)
      assert(ids === ids.sorted)
      assert(history.last === JobState(JobStage.Reduce, 100f))
    } finally {
      spark.conf.set(coalesceKey, prevCoalesce)
      JobProgress.detach(spark, listener)
    }
  }
}
