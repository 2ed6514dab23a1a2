package graft.plans

import java.sql.Timestamp

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the native as-of operator — the custom physical
  * plan is the highest-risk code in the repo, and
  * [[GraftAsOfJoinSpec]]'s hand-built edge rows can't cover the space
  * a generator can: arbitrary key/time collisions (many left rows
  * tied on the same timestamp, probe times exactly ON right
  * timestamps), keys present on only one side, null keys and times on
  * both sides, and empty either side. For every seeded sample the
  * exec's output must equal a driver-side brute scan of the contract:
  * per left row, the LATEST right row with rt ≤ t on the same key
  * (inclusive), null key/time never matching, unmatched rows dropped.
  * Right (key, time) pairs are generated distinct — the contract
  * doesn't order same-instant duplicates.
  */
class GraftAsOfJoinPropertySpec extends SparkSpec {

  private def ts(s: Long) = new Timestamp(s * 1000L)

  // small time domain → heavy at-or-before ties and exact-equal probes
  private val leftGen: Gen[List[(Long, Option[String], Option[Long])]] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.choose(0L, 1000000L),
      Gen.frequency(5 -> Gen.oneOf("a", "b", "c").map(Some(_)),
        1 -> Gen.const(Option.empty[String])),
      Gen.frequency(5 -> Gen.choose(0L, 30L).map(Some(_)),
        1 -> Gen.const(Option.empty[Long])))))

  private val rightGen: Gen[List[(Option[String], Option[Long], Long)]] =
    Gen.choose(0, 25).flatMap(n => Gen.listOfN(n, Gen.zip(
      Gen.frequency(5 -> Gen.oneOf("a", "b", "c").map(Some(_)),
        1 -> Gen.const(Option.empty[String])),
      Gen.frequency(5 -> Gen.choose(0L, 30L).map(Some(_)),
        1 -> Gen.const(Option.empty[Long])),
      Gen.choose(-999L, 999L))))

  test("native as-of equals a brute latest-at-or-before scan on arbitrary data") {
    import spark.implicits._
    (0 to 7).foreach { i =>
      val left =
        if (i == 6) Nil // empty probe side
        else leftGen.pureApply(Gen.Parameters.default, Seed(i.toLong))
          .zipWithIndex.map { case ((_, k, t), id) => (id.toLong, k, t) }
      val right =
        if (i == 7) Nil // empty build side
        else rightGen.pureApply(Gen.Parameters.default, Seed(100L + i))
          // the contract doesn't order same-instant duplicates: keep
          // one row per (key, time)
          .groupBy(r => (r._1, r._2)).values.map(_.head).toList
      val l = left.map { case (id, k, t) => (id, k, t.map(ts)) }
        .toDF("id", "k", "t")
      val r = right.map { case (k, t, v) => (k, t.map(ts), v) }
        .toDF("rk", "rt", "v")
      val got = GraftAsOfJoin.asofJoin(l, r, "k", "rk", "t", "rt")
        .select("id", "v").collect()
        .map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for {
        (id, Some(k), Some(t)) <- left
        cands = right.collect {
          case (Some(rk), Some(rt), v) if rk == k && rt <= t => (rt, v)
        } if cands.nonEmpty
      } yield (id, cands.maxBy(_._1)._2)).toSet
      assert(got === want, s"seed $i: native as-of diverges from brute\n" +
        s"got=${got.toList.sorted}\nwant=${want.toList.sorted}")
    }
    // the generated corpus actually exercises the hostile corners
    val lAll = (0 to 5).flatMap(i =>
      leftGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    val rAll = (0 to 5).flatMap(i =>
      rightGen.pureApply(Gen.Parameters.default, Seed(100L + i)))
    assert(lAll.exists(_._2.isEmpty) && lAll.exists(_._3.isEmpty),
      "no null key/time on the left in any seed")
    assert(rAll.exists(_._1.isEmpty) && rAll.exists(_._2.isEmpty),
      "no null key/time on the right in any seed")
    val rTimes = rAll.collect { case (Some(k), Some(t), _) => (k, t) }.toSet
    assert(lAll.exists { case (_, Some(k), Some(t)) => rTimes((k, t)); case _ => false },
      "no probe lands exactly ON a right timestamp in any seed")
  }
}
