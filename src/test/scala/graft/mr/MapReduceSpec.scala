package graft.mr

import graft.SparkSpec

/** Parity tests for the typed MapReduce API against the reference's
  * sample client (FIXTURES.md §2; `Sample Client/SampleClient.cpp`).
  */
class MapReduceSpec extends SparkSpec {

  /** The exact 3-string input of `SampleClient.cpp:74-79`. */
  private val sampleInput = Seq(
    "This string is full of characters",
    "Multithreading is awesome",
    "race conditions are bad")

  /** Golden 21-pair output (FIXTURES.md §2), compared as a set — output
    * order is nondeterministic (`MapReduceFramework.cpp:181-184`).
    */
  private val golden: Set[(String, Long)] = Set(
    " " -> 10L, "M" -> 1L, "T" -> 1L, "a" -> 7L, "b" -> 1L, "c" -> 4L,
    "d" -> 3L, "e" -> 6L, "f" -> 2L, "g" -> 2L, "h" -> 3L, "i" -> 8L,
    "l" -> 3L, "m" -> 1L, "n" -> 4L, "o" -> 4L, "r" -> 6L, "s" -> 7L,
    "t" -> 5L, "u" -> 2L, "w" -> 1L)

  test("sample client character count matches the golden output as a set") {
    import spark.implicits._
    val input = spark.createDataset(sampleInput)
    // map = per-string histogram (SampleClient.cpp:34-50: map-side combine);
    // reduce = sum of counts per char (SampleClient.cpp:52-65).
    val out = MapReduce.run(input) { s =>
      s.groupBy(identity).iterator.map { case (c, cs) => (c.toString, cs.length.toLong) }
    } { (ch, counts) => Iterator.single((ch, counts.sum)) }
    assert(out.collect().toSet === golden)
  }

  test("runAggregate (partial-agg fast path) matches the golden output") {
    import spark.implicits._
    val input = spark.createDataset(sampleInput)
    val out = MapReduce.runAggregate(input) { s =>
      s.iterator.map(c => (c.toString, 1L))
    } (_ + _)
    assert(out.collect().toSet === golden)
  }

  test("submit/poll/waitForJob reproduces the sample client driver loop") {
    import spark.implicits._
    // the driver pattern of SampleClient.cpp:82-99: start the job, poll
    // getJobState until (REDUCE, 100), then consume the output
    val input = spark.createDataset(sampleInput)
    val handle = MapReduce.submit(input) { s =>
      s.groupBy(identity).iterator.map { case (c, cs) => (c.toString, cs.length.toLong) }
    } { (ch, counts) => Iterator.single((ch, counts.sum)) }
    var polls = 0
    while (!(handle.state.stage == JobStage.Reduce && handle.state.percentage == 100f)
      && polls < 3000) {
      polls += 1
      Thread.sleep(5)
    }
    assert(handle.state === JobState(JobStage.Reduce, 100f))
    val out = handle.close()
    assert(out.toSet === golden)
  }

  test("concurrent submits keep independent progress (job-group scoping)") {
    import spark.implicits._
    val a = MapReduce.submit(spark.createDataset(1 to 5000))(i => Iterator((i % 50, 1L)))(
      (k, vs) => Iterator((k, vs.sum)))
    val b = MapReduce.submit(spark.createDataset(1 to 5000))(i => Iterator((i % 25, 1L)))(
      (k, vs) => Iterator((k, vs.sum)))
    val outA = a.close()
    val outB = b.close()
    assert(outA.toMap === (1 to 5000).groupBy(_ % 50).map { case (k, v) => (k, v.size.toLong) })
    assert(outB.toMap === (1 to 5000).groupBy(_ % 25).map { case (k, v) => (k, v.size.toLong) })
    // each handle's machine terminated at its own (REDUCE, 100)
    assert(a.state === JobState(JobStage.Reduce, 100f))
    assert(b.state === JobState(JobStage.Reduce, 100f))
  }

  test("submitWrite streams output to parquet with the same lifecycle") {
    import spark.implicits._
    val input = spark.createDataset(sampleInput)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft-mr-sink-${System.nanoTime()}"
    val handle = MapReduce.submitWrite(input, path) { s =>
      s.groupBy(identity).iterator.map { case (c, cs) => (c.toString, cs.length.toLong) }
    } { (ch, counts) => Iterator.single((ch, counts.sum)) }
    val n = handle.close()
    assert(n === golden.size)
    val written = spark.read.parquet(path).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(written === golden)
  }

  test("multiThreadLevel controls map parallelism; results are N-independent") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted}
    import spark.implicits._
    val input = spark.createDataset(1 to 5000)
    def job(level: Int) =
      MapReduce.run(input, level)(i => Iterator((i % 7, 1L)))((k, vs) =>
        Iterator((k, vs.sum))).collect().toSet
    // the reference contract: multiThreadLevel changes execution width,
    // never the result (MapReduceFramework.h:18-20)
    val base = job(0)
    assert(job(1) === base)
    assert(job(3) === base)
    // the knob shows up as task counts: a shuffle-writing (map) stage
    // with exactly `level` tasks exists
    val widths = scala.collection.mutable.Set.empty[Int]
    val probe = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        if (org.apache.spark.scheduler.GraftSchedulerAccess.writesShuffle(e.stageInfo))
          widths += e.stageInfo.numTasks
    }
    spark.sparkContext.addSparkListener(probe)
    try {
      assert(job(3) === base)
      // listener events are async: wait (bounded) for the stage to land
      var waited = 0
      while (!widths.contains(3) && waited < 5000) { Thread.sleep(10); waited += 10 }
    } finally spark.sparkContext.removeSparkListener(probe)
    assert(widths.contains(3), s"no 3-task map stage observed (saw $widths)")
  }

  test("map may emit zero pairs (filter) and many pairs (expand)") {
    import spark.implicits._
    val input = spark.createDataset(Seq(1, 2, 3, 4, 5))
    val out = MapReduce.run(input) { i =>
      if (i % 2 == 0) Iterator.tabulate(i)(j => (i, j.toLong)) else Iterator.empty
    } { (k, vs) => Iterator.single((k, vs.sum)) }
    assert(out.collect().toSet === Set(2 -> 1L, 4 -> 6L))
  }

  test("keys need only ordering + encodability (case-class key with custom Ordering)") {
    // the reference contract requires only operator< on K2
    // (MapReduceClient.h:22-26); the Spark engine requires Encoder, with
    // grouping by encoded-value equality (SURVEY.md §7.5)
    import MapReduceSpec.VKey
    import spark.implicits._
    implicit val ord: Ordering[VKey] = Ordering.by(k => (k.major, k.minor))
    val input = spark.createDataset((1 to 40).map(i => (VKey(i % 3, i % 2), i.toLong)))
    val out = MapReduce.run(input)(Iterator.single(_)) { (k, vs) =>
      Iterator.single((k, vs.sum))
    }.collect().toMap
    val expected = (1 to 40).map(i => (VKey(i % 3, i % 2), i.toLong))
      .groupBy(_._1).map { case (k, ps) => (k, ps.map(_._2).sum) }
    assert(out === expected)
  }

  test("reduce sees all values of a key exactly once, may emit many pairs") {
    import spark.implicits._
    val input = spark.createDataset((1 to 100).map(i => (i % 7, i.toLong)))
    val out = MapReduce.run(input)(Iterator.single(_)) { (k, vs) =>
      val list = vs.toList
      Iterator((s"count_$k", list.size.toLong), (s"sum_$k", list.sum))
    }
    val expected = (1 to 100).groupBy(_ % 7).flatMap { case (k, is) =>
      Seq((s"count_$k", is.size.toLong), (s"sum_$k", is.map(_.toLong).sum))
    }.toSet
    assert(out.collect().toSet === expected)
  }
}

object MapReduceSpec {
  /** Top-level so spark.implicits can derive its Encoder. */
  final case class VKey(major: Int, minor: Int)
}
