package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Invariant pins for the behavioral operators (exact values are gated
  * by the DuckDB oracle; these explain the semantics when a hash breaks).
  */
class BehaviorSpec extends SparkSpec {

  test("sessionize: ordinals dense from 1, durations non-negative, events conserved") {
    val out = BehaviorQueries.sessionize(spark, sf).cache()
    try {
      // per-user session ordinals are 1..k with no gaps
      val bad = out.groupBy("user_id")
        .agg(count(lit(1)).as("k"), min("session_seq").as("lo"), max("session_seq").as("hi"))
        .where(col("lo") =!= 1L || col("hi") =!= col("k"))
      assert(bad.count() === 0)
      assert(out.where(col("duration_us") < 0).count() === 0)
      // every event lands in exactly one session
      val total = out.agg(sum("n_events")).head().getLong(0)
      assert(total === Tables.events(spark, sf).count())
    } finally { out.unpersist(): Unit }
  }

  test("sessionize: consecutive sessions of one user are separated by > 30 minutes") {
    val out = BehaviorQueries.sessionize(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_seq")
    val gaps = out
      .withColumn("prev_end", lag("end_ts", 1).over(w))
      .where(col("prev_end").isNotNull)
      .where(unix_micros(col("start_ts")) - unix_micros(col("prev_end")) <= 30L * 60 * 1000000)
    assert(gaps.count() === 0)
  }

  test("anomaly: flags exactly the strict-2-sigma exceeders of each type") {
    val ev = Tables.events(spark, sf).where(col("value").isNotNull)
      .select(col("event_type"), col("value").cast("decimal(18,2)").cast("double").as("v"))
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val byType = ev.groupBy(_._1)
    val expected = byType.map { case (t, rows) =>
      val xs = rows.map(_._2)
      val n = xs.length.toDouble
      val mean = xs.sum / n
      val variance = xs.map(x => (x - mean) * (x - mean)).sum / n
      t -> xs.count(x => (x - mean) * (x - mean) > 4 * variance).toLong
    }.filter(_._2 > 0)
    val got = BehaviorQueries.anomaly(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  test("transitions: ppm near-normalizes per prev_type and counts conserve") {
    val out = BehaviorQueries.transitions(spark, sf).cache()
    try {
      // Σ ppm per prev_type lands in (1e6 - |fanout|, 1e6] — each integer
      // division truncates strictly less than one ppm
      val sums = out.groupBy("prev_type")
        .agg(sum("ppm").as("p"), count(lit(1)).as("k")).collect()
      sums.foreach { r =>
        val (p, k) = (r.getLong(1), r.getLong(2))
        assert(p <= 1000000L && p > 1000000L - k, s"${r.getString(0)}: $p with $k branches")
      }
      // bigram total = events - one first-event per user
      val nBigrams = out.agg(sum("n")).head().getLong(0)
      val ev = Tables.events(spark, sf)
      assert(nBigrams ===
        ev.count() - ev.select("user_id").distinct().count())
    } finally { out.unpersist(): Unit }
  }

  test("rolling distinct: L7 >= L1 per day and matches a brute-force window") {
    val ud = Tables.events(spark, sf)
      .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getDate(1).toLocalDate))
    val days = ud.map(_._2).distinct
    val expected = days.map { d =>
      d -> ud.filter { case (_, ed) =>
        !ed.isAfter(d) && ed.isAfter(d.minusDays(7))
      }.map(_._1).distinct.length.toLong
    }.toMap
    val got = BehaviorQueries.rollingDistinct(spark, sf).collect()
      .map(r => r.getDate(0).toLocalDate -> r.getLong(1)).toMap
    assert(got === expected)
    val l1 = ud.groupBy(_._2).map { case (d, rs) => d -> rs.map(_._1).distinct.length.toLong }
    l1.foreach { case (d, n) => assert(got(d) >= n) }
  }

  test("profile: one row per column, distinct <= nonnull <= rows, min <= max") {
    val rows = BehaviorQueries.profile(spark, sf).collect()
    assert(rows.length === 6)
    assert(rows.map(_.getString(1)).toSet === Set(
      "o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority"))
    rows.foreach { r =>
      val (nRows, nn, nd) = (r.getLong(0), r.getLong(2), r.getLong(3))
      assert(nd <= nn && nn <= nRows, s"${r.getString(1)}: $nd/$nn/$nRows")
      assert(r.getString(4) <= r.getString(5) ||
        // numeric strings compare numerically in the engines, not lexically
        BigDecimal(r.getString(4)) <= BigDecimal(r.getString(5)))
    }
  }

  test("event paths replay the per-user ordered history and live flags") {
    val got = BehaviorQueries.eventPaths(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getString(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap
    val want = graft.Tables.events(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000 +
        r.getTimestamp(1).getNanos / 1000 % 1000, r.getLong(2), r.getString(3)))
      .groupBy(_._1).map { case (u, evs) =>
        u -> evs.sortBy(e => (e._2, e._3)).map(_._4).mkString(">")
      }
    assert(got.keySet === want.keySet)
    want.foreach { case (u, path) =>
      val (n, p, sgn, burst, rec) = got(u)
      assert(p === path && n === path.split(">").length.toLong)
      assert(sgn === path.startsWith("signup"))
      assert(burst === path.contains("error>error>error"))
      assert(rec === path.contains("purchase>error>purchase"))
    }
    // every flag fires for someone and abstains for someone at this sf
    assert(got.values.exists(_._3) && got.values.exists(!_._3))
    assert(got.values.exists(_._4) && got.values.exists(!_._4))
    assert(got.values.exists(_._5) && got.values.exists(!_._5))
  }

  test("interval merge equals a per-user sweep-line recompute") {
    val got = BehaviorQueries.intervalMerge(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as s", "event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ttl = 1800L * 1000000L
    val want = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val sorted = rows.sortBy(e => (e._2, e._3)).map(_._2)
      // sweep line: extend the open block while the next start is inside it
      val blocks = sorted.foldLeft(List.empty[(Long, Long, Long)]) {
        case (acc, s) => acc match {
          case (bs, be, n) :: rest if s <= be =>
            (bs, math.max(be, s + ttl), n + 1) :: rest
          case _ => (s, s + ttl, 1L) :: acc
        }
      }.reverse
      blocks.zipWithIndex.map { case ((bs, be, n), i) =>
        (u, i + 1L) -> (n, bs, be, be - bs)
      }
    }
    assert(got === want)
    // merged blocks of one user never overlap (the defining invariant)
    got.groupBy(_._1._1).foreach { case (_, bs) =>
      val spans = bs.toSeq.sortBy(_._1._2).map(v => (v._2._2, v._2._3))
      spans.zip(spans.tail).foreach { case ((_, e1), (s2, _)) =>
        assert(s2 > e1, "adjacent merged blocks overlap")
      }
    }
    // merging is live at this sf: some block holds more than one event
    assert(got.values.exists(_._1 > 1L))
  }

  test("journey trigrams equal the brute per-user sliding window, top-20") {
    val got = BehaviorQueries.journeyTrigrams(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as t", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val counts = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(e => (e._2, e._3)).map(_._4).sliding(3)
        .filter(_.length == 3)
        // arrays compare by reference — tuple-ize before grouping
        .map(w => (w(0), w(1), w(2)))
    }.groupBy(identity).map { case (tri, hits) => tri -> hits.length.toLong }
    val want = counts.toSeq
      .map { case ((a, b, c), n) => (a, b, c, n) }
      .sortBy { case (a, b, c, n) => (-n, a, b, c) }
      .take(20)
    assert(got.toSeq === want)
  }

  test("fifo match pairs k-th click with k-th purchase per user") {
    val got = BehaviorQueries.fifoMatch(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val evs = graft.Tables.events(spark, sf)
      .where(col("event_type").isin("click", "purchase"))
      .selectExpr("user_id", "event_type", "unix_micros(ts) as t", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val want = evs.groupBy(_._1).flatMap { case (u, rows) =>
      val clicks = rows.filter(_._2 == "click").sortBy(e => (e._3, e._4)).map(_._3)
      val buys = rows.filter(_._2 == "purchase").sortBy(e => (e._3, e._4)).map(_._3)
      val pairs = clicks.zip(buys)
      if (pairs.isEmpty) None
      else Some(u -> (pairs.length.toLong,
        pairs.map { case (c, b) => b - c }.sum,
        pairs.count { case (c, b) => b >= c }.toLong))
    }
    assert(got === want)
    // both match outcomes are live: some lags run negative (purchase
    // stream ahead of clicks) and some positive
    assert(got.values.exists(_._2 < 0) || got.values.exists(v => v._3 < v._1))
    assert(got.values.exists(v => v._3 > 0))
  }

  test("activity heatmap tiles the full week grid and conserves events") {
    val rows = BehaviorQueries.activityHeatmap(spark, sf).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3), r.getLong(4))))
    val total = graft.Tables.events(spark, sf).count()
    assert(rows.map(_._2._1).sum === total, "events not conserved")
    rows.foreach { case ((dow, hr), (n, users, cents)) =>
      assert(dow >= 1 && dow <= 7 && hr >= 0 && hr <= 23)
      assert(users <= n && cents >= 0)
    }
    // a month of traffic lights (nearly) every (dow, hour) cell even at
    // the 1000-event spec sf — empty cells are simply absent rows
    assert(rows.length >= 160 && rows.length <= 168)
    assert(rows.map(_._1).distinct.length === rows.length, "duplicate cells")
  }

  test("attribution credits the latest 7-day touch, else direct") {
    val got = BehaviorQueries.lastTouchAttribution(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(3)) -1L else r.getLong(3)))
      .toMap
    val evs = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as t", "event_id", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val want = evs.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(e => (e._2, e._3))
      sorted.zipWithIndex.collect {
        case ((_, t, id, "purchase"), i) =>
          val touch = sorted.take(i).reverse
            .find(e => e._4 == "view" || e._4 == "click")
          touch match {
            case Some((_, tt, _, tp)) if t - tt <= 604800000000L =>
              id -> (tp, (t - tt) / 1000000L)
            case _ => id -> ("direct", -1L)
          }
      }
    }.toMap
    assert(got === want)
    // both outcomes live: some purchases attributed, some direct
    assert(got.values.exists(_._1 != "direct") &&
      got.values.exists(_._1 == "direct"))
  }

  test("drift TVD equals the brute two-epoch histogram compare, in [0, 1e6]") {
    val got = BehaviorQueries.driftTvd(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val evs = graft.Tables.events(spark, sf)
      .where(col("value").isNotNull)
      .selectExpr("event_type", "dayofmonth(ts) as dom",
        "cast(cast(value as decimal(18,2)) * 100 as bigint) div 2000 as bin")
      .collect()
      .map(r => (r.getString(0), if (r.getInt(1) <= 15) 0 else 1, r.getLong(2)))
    val want = evs.groupBy(_._1).map { case (tpe, rows) =>
      val tot = Array(0L, 1L).map(e => rows.count(_._2 == e).toLong)
      val byBin = rows.groupBy(_._3).map { case (bin, hits) =>
        val ppm = Array(0, 1).map(e =>
          if (tot(e) == 0) 0L
          else hits.count(_._2 == e).toLong * 1000000L / tot(e))
        bin -> ppm
      }
      val tvd = byBin.values.map(p => math.abs(p(0) - p(1))).sum / 2
      tpe -> (byBin.size.toLong, tvd)
    }
    assert(got === want)
    got.values.foreach { case (bins, tvd) =>
      assert(bins > 0 && tvd >= 0L && tvd <= 1000000L)
    }
    // drift is nonzero somewhere (the halves are different samples)
    assert(got.values.exists(_._2 > 0L))
  }

  test("session quality conserves sessions and derives its ratios exactly") {
    val rows = BehaviorQueries.sessionQuality(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (day, n, b, ppm, _, _) =>
      assert(b <= n, s"$day bounces exceed sessions")
      assert(ppm === b * 1000000L / n, s"$day bounce_ppm")
    }
    val sessions = BehaviorQueries.sessionize(spark, sf).count()
    assert(rows.map(_._2).sum === sessions, "session conservation")
    assert(rows.exists(_._3 > 0), "no bounces observed")
    assert(rows.exists(r => r._3 < r._2), "every session bounced")
  }

  test("attribution compare equals a brute two-model replay and conserves purchases") {
    // corpus invariant the RANGE-frame determinism rests on: no two
    // same-user events share a microsecond (the frame orders by t_us
    // alone, so a tie would make first/last touch engine-dependent).
    // A regeneration that introduces ties must break HERE, loudly,
    // instead of as a flaky downstream hash mismatch.
    val ties = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "unix_micros(ts) as t_us")
      .groupBy("user_id", "t_us").count()
      .where(col("count") > 1).count()
    assert(ties === 0L, s"$ties same-user same-microsecond event pairs")
    val got = BehaviorQueries.attributionCompare(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val ev = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "unix_micros(ts) as t",
        "coalesce(cast(cast(value as decimal(18,2)) * 100 as bigint), 0L) as cents")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val lookback = 604800000000L
    var want = Map.empty[(String, String), (Long, Long)]
    ev.groupBy(_._1).foreach { case (_, xs) =>
      val touches = xs.filter(e => e._2 == "view" || e._2 == "click").sortBy(_._3)
      xs.filter(_._2 == "purchase").foreach { case (_, _, t, cents) =>
        val in = touches.filter(e => e._3 >= t - lookback && e._3 <= t)
        val key =
          if (in.isEmpty) ("direct", "direct")
          else (in.head._2, in.last._2)
        val (n, c) = want.getOrElse(key, (0L, 0L))
        want += key -> (n + 1, c + cents)
      }
    }
    assert(got === want)
    val purchases = ev.count(_._2 == "purchase").toLong
    assert(got.values.map(_._1).sum === purchases)
    // the comparison is informative: the two models disagree somewhere
    assert(got.keys.exists(k => k._1 != k._2), "first and last touch never differ")
  }

  test("key skew histogram conserves keys and rows; buckets bound their frequencies") {
    val rows = BehaviorQueries.keySkewHistogram(spark, sf).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (tpe, bucket, nKeys, nRows, mn, mx) =>
      assert((1L << bucket) <= mn && mx < (1L << (bucket + 1)),
        s"$tpe bucket $bucket holds [$mn,$mx]")
      assert(nKeys <= nRows)
    }
    val totalRows = rows.map(_._4).sum
    assert(totalRows === graft.Tables.events(spark, sf).count())
    val totalKeys = rows.map(_._3).sum
    val distinctPairs = graft.Tables.events(spark, sf)
      .select("event_type", "user_id").distinct().count()
    assert(totalKeys === distinctPairs)
  }

  test("incremental sessionization equals the one-pass form; boundary merges live at sf0.01") {
    // sf0.01: the epoch seam has real cross-boundary sessions (none
    // exist at the tiny spec sf — 14 users straddle the cut here)
    val sf01 = "/root/testdata/sf0.01"
    val got = BehaviorQueries.incrementalSessions(spark, sf01).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // brute one-pass sessionize on the driver
    val ev = graft.Tables.events(spark, sf01)
      .selectExpr("user_id", "event_id", "unix_micros(ts) as t")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val gap = 6L * 3600L * 1000000L
    var want = Map.empty[(Long, Long), (Long, Long, Long, Long)]
    var crossBoundary = 0
    val boundary = 1705363200000000L
    ev.groupBy(_._1).foreach { case (user, xs) =>
      val sorted = xs.sortBy(r => (r._3, r._2)).map(_._3)
      var sid = 0L
      var block = Vector.empty[Long]
      def flush(): Unit = if (block.nonEmpty) {
        want += (user, sid) -> (block.length.toLong, block.head, block.last,
          block.last - block.head)
        if (block.head < boundary && block.last >= boundary) crossBoundary += 1
      }
      sorted.foreach { t =>
        if (block.nonEmpty && t - block.last <= gap) block = block :+ t
        else { flush(); sid += 1; block = Vector(t) } // first brk ⇒ sid 1
      }
      flush()
    }
    assert(got === want)
    assert(crossBoundary > 0, "no session spans the epoch boundary at sf0.01")
  }

  test("rolling sketch estimate tracks the exact rolling distinct within 5%") {
    val exact = BehaviorQueries.rollingDistinct(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    val est = BehaviorQueries.rollingDistinctSketch(spark, sf).collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet, "sketch and exact cover the same days")
    est.foreach { case (day, e) =>
      val x = exact(day)
      assert(e > 0 && math.abs(e - x).toDouble / x <= 0.05,
        s"day $day: est $e vs exact $x")
    }
    // registered driver form renders the same bound as a TRUE bit
    BehaviorQueries.rollingDistinctSketchChecked(spark, sf).collect()
      .foreach { r =>
        assert(r.getBoolean(2), s"audit bit red for ${r.getDate(0)}")
      }
  }

  test("stickiness equals the brute daily/monthly distinct replay, bounded by 1e6") {
    val out = BehaviorQueries.stickiness(spark, sf).collect()
      .map(r => r.getDate(0).toString ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val daily = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "cast(date_trunc('month', ts) as date) as m",
        "cast(ts as date) as day")
      .distinct().collect()
      .map(r => (r.getLong(0), r.getDate(1).toString, r.getDate(2).toString))
    assert(out.keySet === daily.map(_._2).toSet)
    daily.groupBy(_._2).foreach { case (month, xs) =>
      val dau = xs.groupBy(_._3).map { case (_, us) => us.map(_._1).distinct.size.toLong }
      val nDays = dau.size.toLong
      val sumDau = dau.sum
      val mau = xs.map(_._1).distinct.size.toLong
      val ppm = sumDau * 1000000L / (nDays * mau)
      val (qd, qs, qm, qp) = out(month)
      assert((qd, qs, qm, qp) === ((nDays, sumDau, mau, ppm)), s"month $month")
      assert(qp > 0L && qp <= 1000000L)
    }
  }

  test("new+returning equals active each week; firsts are counted exactly once") {
    val rows = BehaviorQueries.newVsReturning(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (wk, nw, ret, act) =>
      assert(nw + ret === act, s"week $wk split does not sum")
    }
    val totalUsers = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum === totalUsers,
      "every user is new in exactly one week")
    // the earliest week is all-new by construction
    val first = rows.minBy(_._1)
    assert(first._3 === 0L, "returning users in the first week")
  }
}
