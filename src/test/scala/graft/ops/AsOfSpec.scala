package graft.ops

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("asof join matches latest at-or-before, inclusive at equal time") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 5L, "r5"), (1L, 20L, "r20"), (2L, 9L, "r9"))
      .toDF("k", "rt", "v")
    val out = AsOf.asofJoin(left, right, "k", "t", "rt", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    // (1,10)->r5; (1,20)->r20 (inclusive); (2,5) has no prior row -> dropped
    assert(out === Set((1L, 10L, "a", "r5"), (1L, 20L, "b", "r20")))
  }

  test("forward asof matches earliest at-or-after, inclusive at equal time") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"), (3L, 1L, "d"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (2L, 4L, "r4"))
      .toDF("k", "rt", "v")
    val out = AsOf.asofJoinForward(left, right, "k", "t", "rt", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))).toSet
    // (1,10)->r10 (inclusive); (1,20) has no following row -> dropped;
    // (2,5): r4 is BEFORE it -> dropped; (3,1): no right rows at all
    assert(out === Set((1L, 10L, "a", "r10")))
  }

  test("forward asof on the corpus equals a brute per-row scan") {
    val got = AsOf.clickToNextPurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val ev = graft.Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getTimestamp(3).getTime * 1000 +
          (r.getTimestamp(3).getNanos / 1000) % 1000))
    val buys = ev.filter(_._3 == "purchase").groupBy(_._2)
    val want = ev.filter(_._3 == "click").flatMap { case (id, u, _, t) =>
      buys.getOrElse(u, Array.empty).map(_._4).filter(_ >= t).sorted.headOption
        .map(bt => (id, u, t, bt, bt - t))
    }.toSet
    assert(got.nonEmpty && got === want)
  }

  test("nearest-event join equals a brute both-direction scan with before-wins ties") {
    val got = AsOf.nearestPurchase(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("event_id", "user_id", "event_type", "unix_micros(ts) as t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val buysByUser = ev.filter(_._3 == "purchase").groupBy(_._2)
    val want = ev.filter(_._3 == "click").flatMap { case (cid, u, _, ct) =>
      val buys = buysByUser.getOrElse(u, Array.empty)
      // at-or-before candidate: latest (t, id); strictly-after: earliest
      val prev = buys.filter(_._4 <= ct)
        .sortBy(b => (b._4, b._1)).lastOption
      val next = buys.filter(_._4 > ct)
        .sortBy(b => (b._4, b._1)).headOption
      (prev, next) match {
        case (None, None) => None
        case (Some(p), None) => Some((u, cid, ct, p._1, p._4 - ct, "before"))
        case (None, Some(n)) => Some((u, cid, ct, n._1, n._4 - ct, "after"))
        case (Some(p), Some(n)) =>
          if (ct - p._4 <= n._4 - ct) Some((u, cid, ct, p._1, p._4 - ct, "before"))
          else Some((u, cid, ct, n._1, n._4 - ct, "after"))
      }
    }.toSet
    assert(got.nonEmpty && got === want)
    // both directions live
    assert(got.exists(_._6 == "before") && got.exists(_._6 == "after"))
    assert(got.exists(_._5 < 0), "some nearest purchase precedes its click")
  }

  test("a matching right row with a NULL value yields NULL, not an older value") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 1L, Some("old")), (1L, 8L, None: Option[String]))
      .toDF("k", "rt", "v")
    val out = AsOf.asofJoin(left, right, "k", "t", "rt", "v").collect()
    assert(out.length === 1)
    assert(out.head.isNullAt(2), "the t=8 NULL-valued row is the match, not t=1's 'old'")
  }
}
