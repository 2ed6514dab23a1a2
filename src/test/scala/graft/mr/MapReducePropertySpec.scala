package graft.mr

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the MapReduce contract (FIXTURES.md §3):
  *  1. grouping invariant — every emitted value reaches `reduce` exactly
  *     once, under its key (`MapReduceClient.h:61-64`);
  *  2. determinism — for commutative+associative reducers the engine
  *     equals a sequential groupBy∘fold, for any partition count;
  *  3. flatMap freedom — 0 or N emissions round-trip.
  *
  * (Plain ScalaCheck generators driven from fixed seeds — scalatestplus
  * is not on the classpath.)
  */
class MapReducePropertySpec extends SparkSpec {

  private val smallPairs: Gen[List[(Int, Int)]] =
    Gen.listOfN(60, Gen.zip(Gen.choose(0, 7), Gen.choose(-50, 50)))

  private def samples(n: Int): Seq[List[(Int, Int)]] =
    (1 to n).map(i => smallPairs.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("grouping invariant: every value reaches reduce exactly once under its key") {
    import spark.implicits._
    samples(8).foreach { pairs =>
      val out = MapReduce.run(spark.createDataset(pairs))(Iterator.single(_)) {
        (k, vs) => Iterator.single((k, vs.toList.sorted))
      }.collect().toMap
      val expected = pairs.groupBy(_._1).map { case (k, ps) => (k, ps.map(_._2).sorted) }
      assert(out === expected, s"input: $pairs")
    }
  }

  test("determinism: commutative+associative reduce equals sequential fold, any partitioning") {
    import spark.implicits._
    samples(8).zip(LazyList.continually(List(1, 2, 4, 7)).flatten).foreach {
      case (pairs, parts) =>
        val ds = spark.createDataset(pairs).repartition(parts)
        val out = MapReduce.runAggregate(ds)(Iterator.single(_))(_ + _)
          .collect().toMap
        val expected = pairs.groupBy(_._1).map { case (k, ps) => (k, ps.map(_._2).sum) }
        assert(out === expected, s"parts=$parts input: $pairs")
    }
  }

  test("flatMap freedom: 0..N emissions per input and per group round-trip") {
    import spark.implicits._
    samples(8).foreach { pairs =>
      val out = MapReduce.run(spark.createDataset(pairs)) { case (k, v) =>
        Iterator.fill(math.floorMod(v, 3))((k, v)) // emit 0, 1 or 2 copies
      } { (k, vs) =>
        val l = vs.toList
        if (l.isEmpty) Iterator.empty else Iterator((k, l.size), (k, l.sum))
      }.collect().toList
      val expected = pairs
        .flatMap { case (k, v) => List.fill(math.floorMod(v, 3))((k, v)) }
        .groupBy(_._1).toList
        .flatMap { case (k, ps) => List((k, ps.size), (k, ps.map(_._2).sum)) }
      assert(out.groupBy(identity).view.mapValues(_.size).toMap ===
        expected.groupBy(identity).view.mapValues(_.size).toMap, s"input: $pairs")
    }
  }
}
