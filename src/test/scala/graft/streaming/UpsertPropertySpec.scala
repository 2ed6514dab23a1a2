package graft.streaming

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property test for the upsert sink's merge algebra: the q233 oracle
  * rests on the claim that per-batch deltas merged through
  * [[Streams.mergeIntoSnapshot]] converge to the one-shot
  * [[Streams.upsertDelta]] of the whole stream for ANY batching — any
  * split, any batch count, including empty batches and same-timestamp
  * ties (broken by event_id). Generators exercise exactly that.
  */
class UpsertPropertySpec extends SparkSpec {

  // events as (user_id, event_id, t_us, event_type, cents) tuples: few
  // users (collisions), small timestamp domain (ties across users),
  // unique event ids, signed cents
  private type Ev = (Long, Long, Long, String, Long)

  private val events: Gen[List[Ev]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n,
      for {
        u <- Gen.choose(1L, 5L)
        t <- Gen.choose(0L, 9L)
        tp <- Gen.oneOf("view", "click", "purchase")
        c <- Gen.choose(-500L, 500L)
      } yield (u, 0L, t, tp, c)))
      .map(_.zipWithIndex.map { case ((u, _, t, tp, c), i) =>
        (u, i.toLong, t, tp, c) })

  private val cuts: Gen[List[Int]] =
    Gen.choose(0, 4).flatMap(k => Gen.listOfN(k, Gen.choose(0, 40)))

  test("random batchings of random streams converge to the one-shot delta") {
    import spark.implicits._
    def df(es: Seq[Ev]) =
      spark.createDataFrame(
          spark.sparkContext.parallelize(es.map(e =>
            org.apache.spark.sql.Row(e._1, e._2, e._3, e._4, e._5)), 2),
          org.apache.spark.sql.types.StructType.fromDDL(
            "user_id BIGINT, event_id BIGINT, t_us BIGINT, " +
              "event_type STRING, cents BIGINT"))
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4), r.getLong(5)))
      .toMap
    (1 to 6).foreach { seed =>
      val es = events.pureApply(Gen.Parameters.default, Seed(seed.toLong))
      val ks = cuts.pureApply(Gen.Parameters.default, Seed(seed.toLong + 100))
        .map(k => if (es.isEmpty) 0 else k % (es.length + 1)).sorted.distinct
      val bounds = (0 +: ks :+ es.length).sorted.distinct
      val batches = bounds.zip(bounds.tail).map { case (a, b) => es.slice(a, b) }
      val root = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(graft.Tables.scratchDir), s"graft-ups-prop-$seed-")
      try {
      batches.zipWithIndex.foreach { case (b, i) =>
        Streams.mergeIntoSnapshot(spark, root, df(b), i.toLong)
      }
      if (es.nonEmpty) {
        val got = rows(Streams.currentSnapshot(spark, root).get)
        val expected = rows(Streams.upsertDelta(df(es)))
        assert(got === expected,
          s"seed $seed: ${batches.map(_.length).mkString("+")} split diverged")
      } else {
        // zero events, zero commits: nothing published
        assert(Streams.currentSnapshot(spark, root).isEmpty ||
          Streams.currentSnapshot(spark, root).get.isEmpty)
      }
      } finally graft.Tables.deleteRecursively(root.toFile)
    }
  }
}
