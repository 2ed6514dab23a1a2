package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Semantics pins for the analytics operators (the exact-value gate is
  * the DuckDB oracle; these pin the invariants a hash compare can't
  * explain when it breaks).
  */
class AnalyticsSpec extends SparkSpec {

  test("q263 calendar fill: spine dense per type, carried days live, flags exact") {
    val rows = AnalyticsQueries.calendarFill(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(rows.nonEmpty)
    assert(rows.exists(_._4 == 0), "no carried (gap) days — spine degenerate")
    assert(rows.exists(_._4 == 1), "no observed days")
    rows.groupBy(_._1).foreach { case (t, rs) =>
      val days = rs.map(_._2).sorted
      assert(days.last - days.head + 1 === days.length.toLong,
        s"$t: filled series not dense")
      // a carried day repeats the previous day's close
      val byDay = rs.map(r => r._2 -> r).toMap
      rs.filter(_._4 == 0).foreach { r =>
        assert(byDay(r._2 - 1)._3 === r._3,
          s"$t day ${r._2}: carried close != previous close")
      }
    }
  }

  test("funnel stages are monotonically non-increasing and ordered") {
    val rows = AnalyticsQueries.funnel(spark, sf)
      .orderBy("stage_ord").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("view", "click", "purchase"))
    val counts = rows.map(_.getLong(2))
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel widened downstream: ${counts.mkString(",")}")
  }

  test("retention offsets are non-negative and cohort sizes bound retained users") {
    val df = AnalyticsQueries.retention(spark, sf)
    assert(df.where(col("week_offset") < 0).count() === 0)
    val cohortUsers = graft.Tables.events(spark, sf)
      .where(col("event_type") === "signup")
      .select("user_id").distinct().count()
    val maxRetained = df.agg(max("n_users")).head().getLong(0)
    assert(maxRetained <= cohortUsers)
  }

  test("pareto frontier members are mutually non-dominating and dominate the rest") {
    val rows = AnalyticsQueries.paretoFrontier(spark, sf).collect()
      .map(r => (r.getDouble(1), r.getInt(2)))
    assert(rows.nonEmpty)
    for (a <- rows; b <- rows if a != b)
      assert(!(a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)),
        s"$a dominates fellow frontier member $b")
    // every frontier row survives against the full table by construction
    // (oracle-checked); spot-check: the globally cheapest part's size is
    // covered by some frontier member at its price or cheaper
    val part = graft.Tables.part(spark, sf)
    val cheapest = part.orderBy(col("p_retailprice"), col("p_size").desc).head()
    assert(rows.exists { case (pr, sz) =>
      pr <= cheapest.getDouble(cheapest.fieldIndex("p_retailprice")) &&
        sz >= cheapest.getInt(cheapest.fieldIndex("p_size"))
    })
  }

  test("merge apply: deletes vanish, updates take the change balance, keeps pass through") {
    val out = AnalyticsQueries.mergeApply(spark, sf)
    val actions = out.groupBy("action").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(actions.keySet.subsetOf(Set("kept", "updated", "inserted")))
    // urgent latest-F customers must not appear at all
    val customers = graft.Tables.customer(spark, sf).count()
    val deleted = customers + actions.getOrElse("inserted", 0L) -
      out.count()
    assert(deleted > 0, "corpus has latest-urgent-F customers; none were deleted")
  }

  test("activity bitmap popcount equals distinct active days") {
    val ev = graft.Tables.events(spark, sf)
    val expected = ev.groupBy(col("user_id"), month(col("ts")).as("m"))
      .agg(countDistinct(dayofmonth(col("ts"))).as("d")).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    AnalyticsQueries.activityBitmap(spark, sf).collect().foreach { r =>
      assert(r.getInt(3).toLong === expected((r.getLong(0), r.getInt(1))))
    }
  }

  test("inverted index: df equals posting length, postings strictly increasing") {
    AnalyticsQueries.invertedIndex(spark, sf).collect().foreach { r =>
      val postings = r.getString(2).split(",").map(_.toLong).toSeq
      assert(postings.length.toLong === r.getLong(1))
      assert(postings.zip(postings.tail).forall { case (a, b) => a < b },
        s"postings not strictly sorted for term ${r.getString(0)}")
    }
  }

  test("moment-form correlations agree with Spark's corr() to float tolerance") {
    val ours = AnalyticsQueries.corrMatrix(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getDouble(3)).toMap
    val li = graft.Tables.lineitem(spark, sf)
    val ref = li.groupBy("l_returnflag").agg(
      corr("l_quantity", "l_extendedprice").as("c1"),
      corr("l_quantity", "l_discount").as("c2"),
      corr("l_extendedprice", "l_discount").as("c3")).collect()
    ref.foreach { r =>
      val f = r.getString(0)
      assert(math.abs(ours((f, "quantity", "extendedprice")) - r.getDouble(1)) < 1e-9)
      assert(math.abs(ours((f, "quantity", "discount")) - r.getDouble(2)) < 1e-9)
      assert(math.abs(ours((f, "extendedprice", "discount")) - r.getDouble(3)) < 1e-9)
    }
    // correlations are bounded
    assert(ours.values.forall(c => c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12))
  }

  test("ntile deciles partition every row into near-equal tiles") {
    val rows = AnalyticsQueries.ntileDeciles(spark, sf).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.keySet === (1 to 10).toSet)
    val total = graft.Tables.customer(spark, sf).count()
    assert(rows.values.sum === total)
    assert(rows.values.max - rows.values.min <= 1)
  }

  test("higher-order folds equal relational aggregates") {
    val hof = AnalyticsQueries.higherOrderFns(spark, sf)
      .select("l_orderkey", "total_qty").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(sum(expr("CAST(l_quantity AS BIGINT)")).as("t"))
      .collect().foreach { r => assert(hof(r.getLong(0)) === r.getLong(1)) }
  }

  test("gap fill covers the full spine with no nulls and carries counts forward") {
    val df = AnalyticsQueries.gapFill(spark, sf)
    val ev = graft.Tables.events(spark, sf)
    val users = ev.select("user_id").distinct().count()
    val days = ev.selectExpr("CAST(max(CAST(ts AS DATE)) - min(CAST(ts AS DATE)) AS INT) + 1")
      .head().getInt(0)
    assert(df.count() === users * days)
    assert(df.where(col("filled").isNull).count() === 0)
    // forward-fill: each day shows the most recent day-with-events count
    val actual = ev.where(col("user_id") === 0)
      .groupBy(col("ts").cast("date").as("day")).count().collect()
      .map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    var carry = 0L
    df.where(col("user_id") === 0).orderBy("day").collect().foreach { r =>
      carry = actual.getOrElse(r.getDate(1).toString, carry)
      assert(r.getLong(2) === carry)
    }
  }

  test("edit-distance join emits each unordered pair once, under threshold") {
    val rows = AnalyticsQueries.editDistanceJoin(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(rows.forall { case (a, b, d) => a < b && d <= 8 })
    assert(rows.map(t => (t._1, t._2)).distinct.length === rows.length)
  }

  test("OHLC candles match a driver-side replay of one group") {
    val candles = AnalyticsQueries.ohlc(spark, sf).collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))))
    assert(candles.nonEmpty)
    candles.foreach { case (_, _, (n, open, high, low, close)) =>
      assert(n > 0 && high >= low)
      assert(open >= low && open <= high && close >= low && close <= high)
    }
    // replay the largest group from the raw rows, ordered by (ts, id)
    val (et, day, _) = candles.maxBy(_._3._1)
    val raw = graft.Tables.events(spark, sf)
      .where(col("value").isNotNull && col("event_type") === et &&
        to_date(col("ts")) === lit(day))
      .select(col("ts"), col("event_id"),
        (col("value").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .collect()
      .map(r => ((r.getTimestamp(0).getTime, r.getLong(1)), r.getLong(2)))
      .sortBy(_._1)
    val expect = (raw.length.toLong, raw.head._2, raw.map(_._2).max,
      raw.map(_._2).min, raw.last._2)
    assert(candles.find(c => c._1 == et && c._2 == day).get._3 === expect)
  }

  test("share-of-total ppm sums to one million minus floor dust") {
    val rows = AnalyticsQueries.shareOfTotal(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val total = rows.map(_._2).sum
    rows.foreach { case (_, cents, ppm) =>
      assert(ppm === cents * 1000000L / total)
    }
    val ppmSum = rows.map(_._3).sum
    assert(ppmSum <= 1000000L && ppmSum > 1000000L - rows.length)
  }

  test("rfm bins replay the interpolated quintile thresholds exactly") {
    val rows = AnalyticsQueries.rfm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))
    assert(rows.nonEmpty)
    // Spark `percentile` linear interpolation: index p*(n-1) between
    // order statistics
    def thresholds(vs: Seq[Long]): Seq[Double] = {
      val s = vs.sorted
      Seq(0.2, 0.4, 0.6, 0.8).map { p =>
        val i = p * (s.length - 1)
        val (lo, hi) = (math.floor(i).toInt, math.ceil(i).toInt)
        s(lo) + (i - lo) * (s(hi) - s(lo))
      }
    }
    def bin(v: Long, th: Seq[Double]) = 1 + th.count(v > _)
    val (tr, tf, tm) = (thresholds(rows.map(_._2)), thresholds(rows.map(_._3)),
      thresholds(rows.map(_._4)))
    rows.foreach { case (_, rec, fr, mon, rb, fb, mb, seg) =>
      assert(rb === bin(rec, tr) && fb === bin(fr, tf) && mb === bin(mon, tm))
      assert(seg === rb * 100 + fb * 10 + mb)
    }
    // monetary quintiles are balanced-ish: every bin is inhabited
    (1 to 5).foreach(b => assert(rows.exists(_._7 == b), s"empty m_bin $b"))
  }

  test("interpolation matches a driver-side replay and brackets every gap") {
    val rows = AnalyticsQueries.interpolate(spark, sf).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate, r.getBoolean(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.forall(_._4 != 0 || true))
    rows.groupBy(_._1).foreach { case (_, series) =>
      val sorted = series.sortBy(_._2.toEpochDay)
      // contiguous daily spine, observed endpoints
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2.toEpochDay === a._2.toEpochDay + 1)
        case _ =>
      }
      assert(sorted.head._3 && sorted.last._3)
      // each interpolated day equals the exact integer lerp of its
      // bracketing observations
      val obsIdx = sorted.zipWithIndex.filter(_._1._3).map(_._2)
      sorted.zipWithIndex.filterNot(_._1._3).foreach { case ((_, d, _, got), i) =>
        val lo = obsIdx.filter(_ < i).max; val hi = obsIdx.filter(_ > i).min
        val (pv, pd) = (sorted(lo)._4, sorted(lo)._2.toEpochDay)
        val (nv, nd) = (sorted(hi)._4, sorted(hi)._2.toEpochDay)
        val want = pv + ((nv - pv) * (d.toEpochDay - pd)) / (nd - pd)
        assert(got === want)
      }
    }
    // gaps exist at this sf, so the lerp path is actually exercised
    assert(rows.exists(!_._3))
  }

  test("period-over-period deltas reconstruct the running series") {
    val rows = AnalyticsQueries.periodOverPeriod(spark, sf).collect()
      .map(r => ((r.getString(0), r.getDate(1).toString),
        (r.getLong(2), if (r.isNullAt(3)) None else Some(r.getLong(3)))))
    assert(rows.nonEmpty)
    rows.groupBy(_._1._1).foreach { case (_, series) =>
      val sorted = series.sortBy(_._1._2)
      assert(sorted.head._2._2.isEmpty) // first month has no prior
      sorted.sliding(2).foreach {
        case Array((_, (prev, _)), (_, (cur, Some(delta)))) =>
          assert(delta === cur - prev)
        case _ => fail("non-first month missing its delta")
      }
    }
    // declines exist, so the signed integer-division path is exercised
    assert(rows.exists(_._2._2.exists(_ < 0)))
  }

  test("deterministic mode equals a driver-side argmax with the same tie-break") {
    val got = AnalyticsQueries.modeDeterministic(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val counts = graft.Tables.lineitem(spark, sf)
      .groupBy("l_linestatus", "l_returnflag").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expect = counts.groupBy(_._1).map { case (st, grp) =>
      val best = grp.minBy(t => (-t._3, t._2))
      st -> (best._2, best._3)
    }
    assert(got === expect && got.nonEmpty)
  }

  test("basket pairs: support floor is live and scores are internally consistent") {
    val rows = AnalyticsQueries.basketPairs(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val nBrands = graft.Tables.part(spark, sf)
      .select("p_brand").distinct().count()
    val allPairs = nBrands * (nBrands - 1) / 2
    assert(rows.length < allPairs, "support floor pruned nothing")
    rows.foreach { case (b1, b2, nPair, nB1, nB2, _, conf, _) =>
      assert(b1 < b2, "pairs must be canonically ordered")
      assert(nPair <= nB1 && nPair <= nB2, "pair count exceeds item count")
      assert(conf <= 1000000L, "confidence above 1")
    }
  }

  test("twap matches a per-user brute-force recompute") {
    import java.sql.Timestamp
    val got = AnalyticsQueries.twap(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    val events = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect()
      .map(r => (r.getLong(0), r.getAs[Timestamp](1), r.getLong(2), r.getLong(3)))
    val brute = events.groupBy(_._1).flatMap { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3))
      val holds = sorted.zip(sorted.tail).map { case (a, b) =>
        val dt = b._2.getTime / 1000 - a._2.getTime / 1000
        (a._4, dt)
      }
      val span = holds.map(_._2).sum
      if (holds.nonEmpty && span > 0)
        Some(u -> (holds.length.toLong, span,
          holds.map { case (c, dt) => c * dt }.sum / span))
      else None
    }
    assert(got === brute)
  }

  test("chi-square: cell grid is complete and contributions are non-negative") {
    val rows = AnalyticsQueries.chiSquare(spark, sf).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(2)).sum
    rows.foreach { r =>
      assert(r.getLong(5) >= 0L, "a squared deviation went negative")
      assert(r.getLong(3) <= n && r.getLong(4) <= n)
    }
    // row totals must be consistent: per-segment rt equals the sum of
    // that segment's cells
    rows.groupBy(_.getString(0)).foreach { case (_, cells) =>
      assert(cells.map(_.getLong(2)).sum === cells.head.getLong(3))
    }
  }

  test("ewma equals the binary-weight brute recompute per user") {
    val got = AnalyticsQueries.ewmaSmooth(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> (r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    val perUser = got.toSeq.groupBy(_._1._1)
    // series heads: an isolated first observation smooths to itself
    val events = graft.Tables.events(spark, sf)
      .selectExpr("user_id", "ts", "event_id",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getLong(3)))
    events.groupBy(_._1).foreach { case (u, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._2.getNanos, e._3)).toIndexedSeq
      sorted.zipWithIndex.foreach { case (e, i) =>
        val taps = (0 until math.min(8, i + 1))
          .map(k => (sorted(i - k)._4, 1L << (7 - k)))
        val expect = taps.map { case (v, w) => v * w }.sum / taps.map(_._2).sum
        assert(got((u, e._3)) === ((e._4, expect)),
          s"user $u event ${e._3}: ewma mismatch")
      }
    }
  }

  test("HLL sketch merge is associative and lands within 5% of exact") {
    val rows = AnalyticsQueries.hllMergeDaily(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (et, merged, direct, exact) =>
      // same lgConfigK + associative union: the merged daily partials
      // must summarize the same multiset the direct sketch saw
      assert(merged === direct, s"$et: merged $merged != direct $direct")
      assert(math.abs(merged - exact).toDouble / exact <= 0.05,
        s"$et: estimate $merged vs exact $exact")
    }
    // registered driver form renders the same two contracts as TRUE bits
    AnalyticsQueries.hllMergeDailyChecked(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3),
        s"audit bit red for ${r.getString(0)}")
    }
  }

  test("count-min sketch estimates are one-sided within eps*N, full probe coverage") {
    val n = graft.Tables.lineitem(spark, sf).count()
    val epsBound = (2718L * n) / (1000L * 1024L)
    val exact = graft.Tables.lineitem(spark, sf)
      .where(col("l_partkey") % 97 === 0 && col("l_partkey") < 100000)
      .groupBy("l_partkey").agg(count(lit(1)).as("exact_n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = AnalyticsQueries.cmsFrequency(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.nonEmpty)
    // every anchored key that occurs gets an estimate (probe coverage),
    // and each estimate is one-sided (>= exact: every occurrence lands
    // in all 4 of the key's cells) within the e*N/width Markov bound
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, e) =>
      assert(e >= exact(k), s"key $k: est $e < exact ${exact(k)}")
      assert(e - exact(k) <= epsBound,
        s"key $k: excess ${e - exact(k)} > bound $epsBound")
    }
    // registered driver form renders the same contracts as TRUE bits
    AnalyticsQueries.cmsFrequencyChecked(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(2) && r.getBoolean(3),
        s"cms audit bit red for key ${r.getLong(0)}")
    }
  }

  test("kll quantile estimates land within 5% rank error, merged and direct") {
    val ranks = Array(0.25, 0.5, 0.75, 0.9, 0.99)
    val got = AnalyticsQueries.kllQuantiles(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getString(3).split(",").map(_.toLong).toSeq,
        r.getString(4).split(",").map(_.toLong).toSeq))
    assert(got.nonEmpty)
    val vals = graft.Tables.events(spark, sf)
      .where(col("value").isNotNull)
      .selectExpr("event_type",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    got.foreach { case (tpe, n, nDays, mergedQ, directQ) =>
      val sorted = vals(tpe)
      assert(n === sorted.length.toLong && nDays > 1)
      for (est <- Seq(mergedQ, directQ); (q, r) <- est.zip(ranks)) {
        val trueRank = sorted.count(_ <= q).toDouble / sorted.length
        assert(math.abs(trueRank - r) <= 0.05,
          s"$tpe rank($q)=$trueRank target $r")
      }
    }
    // registered driver form: the distributed rank audit agrees
    AnalyticsQueries.kllQuantilesChecked(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(3) && r.getBoolean(4),
        s"rank audit red for ${r.getString(0)}")
    }
  }

  test("mad outliers match the brute median/MAD recompute per type") {
    val got = AnalyticsQueries.madOutliers(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val vals = graft.Tables.events(spark, sf)
      .where(col("value").isNotNull)
      .selectExpr("event_type",
        "cast(cast(value as decimal(18,2)) * 100 as long) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got.keySet === vals.keySet)
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      sorted((sorted.length - 1) / 2) // smallest x with 2·rank(x) ≥ n
    }
    vals.foreach { case (tpe, xs) =>
      val med = lowerMedian(xs.toSeq)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)).toSeq)
      val nOut = xs.count(x => math.abs(x - med) > 3 * mad).toLong
      assert(got(tpe) === ((xs.length.toLong, nOut, med, mad)), s"type $tpe")
      // robust gate is live but not degenerate (the long-tailed value
      // distribution makes ~15% of a small group exceed 3 MAD)
      assert(nOut > 0 && nOut < xs.length / 2)
    }
  }

  test("ltv curve: running totals reconcile with per-cell revenue") {
    val rows = AnalyticsQueries.ltvCurve(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val ordered = cells.sortBy(_._2)
      assert(ordered.map(_._2).distinct.length === ordered.length)
      var cum = 0L
      ordered.foreach { case (_, off, n, rev, cumRev) =>
        cum += rev
        assert(off >= 0 && n > 0 && cumRev === cum)
      }
    }
  }

  test("theta overlap estimates are exact below sketch capacity and live") {
    val rows = AnalyticsQueries.audienceOverlap(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 10) // all 5-choose-2 type pairs live
    val universe = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    rows.foreach { case (ta, tb, est, exact) =>
      assert(ta < tb)
      // audiences here are far below theta's k=4096 entries, where the
      // sketch stores the raw hash set: estimates must be EXACT
      assert(est === exact, s"($ta,$tb): est $est != exact $exact")
      assert(exact > 0 && exact < universe, s"($ta,$tb) overlap degenerate")
    }
    // registered driver form renders the bound as a TRUE bit per pair
    AnalyticsQueries.audienceOverlapChecked(spark, sf).collect().foreach { r =>
      assert(r.getBoolean(3), s"audit bit red for ${r.getString(0)}/${r.getString(1)}")
    }
  }

  test("equi-depth histogram: 10 contiguous bins of near-equal depth") {
    val rows = AnalyticsQueries.equidepthHistogram(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq === (0L to 9L))
    val n = rows.map(_._2).sum
    rows.foreach { case (bin, cnt, _, _) =>
      // equi-depth: every bin within 2x of the ideal decile population
      assert(cnt * 10 <= 2 * n && cnt * 20 >= n, s"bin $bin depth $cnt of $n")
    }
    // bins tile the value axis without overlap
    rows.sliding(2).foreach {
      case Array((_, _, _, hiA), (_, _, loB, _)) => assert(hiA < loB)
      case _ =>
    }
  }

  test("funnel latency: ordered quantiles and counts match the funnel stages") {
    val lat = AnalyticsQueries.funnelLatency(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(lat.keySet === Set("view_to_click", "click_to_purchase"))
    lat.values.foreach { case (n, mn, med, p90, mx) =>
      assert(n > 0 && mn <= med && med <= p90 && p90 <= mx)
      assert(mn >= 0, "negative latency")
      assert(mx <= 86400, "latency beyond the 24h funnel deadline")
    }
    // the latency populations are exactly the funnel's surviving stages
    val funnel = AnalyticsQueries.funnel(spark, sf).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(lat("view_to_click")._1 === funnel("click"))
    assert(lat("click_to_purchase")._1 === funnel("purchase"))
  }

  test("rollup shares: each level's ppm shares sum to 1e6 minus truncation") {
    val rows = AnalyticsQueries.rollupShares(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (region, ns) =>
      val sum = ns.map(_._4).sum
      // integer ppm truncates: the nation shares of a region sum to at
      // most 1e6 and lose < 1 ppm per nation
      assert(sum <= 1000000L && sum > 1000000L - ns.length,
        s"$region shares sum $sum")
      // one region share per region, consistent across its rows
      assert(ns.map(_._5).distinct.length === 1)
    }
    val regionShares = rows.groupBy(_._1).map(_._2.head._5)
    val rsum = regionShares.sum
    assert(rsum <= 1000000L && rsum > 1000000L - regionShares.size)
  }

  test("embedding drift equals the brute centroid recompute per source") {
    val got = AnalyticsQueries.embeddingDrift(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val src = graft.Tables.documents(spark, sf)
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val vecs = graft.Tables.embeddings(spark, sf)
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(round(cast(x as double) * 10000) as bigint)) qv")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val dim = vecs.head._2.length
    val corpSum = Array.tabulate(dim)(i => BigInt(vecs.map(_._2(i)).sum))
    val nCorp = vecs.length
    vecs.groupBy(v => src(v._1)).foreach { case (source, vs) =>
      val sSrc = Array.tabulate(dim)(i => BigInt(vs.map(_._2(i)).sum))
      val l1ppm = (0 until dim).map { i =>
        ((sSrc(i) * nCorp - corpSum(i) * vs.length).abs * 1000000) /
          (BigInt(vs.length) * nCorp)
      }.sum
      assert(got(source) === ((vs.length.toLong, l1ppm.toLong)), source)
    }
    // drift is live: sources differ from the corpus centroid
    assert(got.values.exists(_._2 > 0))
  }

  test("weighted median equals the brute cumulative-weight scan per flag") {
    val got = AnalyticsQueries.weightedMedian(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rows = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag",
        "cast(cast(l_extendedprice as decimal(18,2)) * 100 as long) as cents",
        "cast(cast(l_quantity as decimal(18,2)) as long) as qty")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    rows.groupBy(_._1).foreach { case (flag, vs) =>
      val sorted = vs.map(v => (v._2, v._3)).sortBy(_._1)
      val tot = sorted.map(_._2).sum
      var cum = 0L
      val median = sorted.collectFirst {
        case (c, w) if { cum += w; cum * 2 >= tot } => c
      }.get
      assert(got(flag) === ((median, tot)), s"flag $flag")
      // the defining property: weight on either strict side < half
      val below = sorted.takeWhile(_._1 < median).map(_._2).sum
      val above = sorted.dropWhile(_._1 <= median).map(_._2).sum
      assert(below * 2 < tot && above * 2 <= tot)
    }
  }

  test("winsorized mean equals the brute clamp and sits inside [p05,p95]") {
    val got = AnalyticsQueries.winsorizedMean(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val rows = graft.Tables.lineitem(spark, sf)
      .selectExpr("l_returnflag",
        "cast(cast(l_extendedprice as decimal(18,2)) * 100 as long) as cents")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty)
    rows.groupBy(_._1).foreach { case (flag, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length.toLong
      def quant(pct: Long): Long = {
        var cum = 0L
        sorted.collectFirst {
          case c if { cum += 1; cum * 100 >= n * pct } => c
        }.get
      }
      val (p05, p95) = (quant(5), quant(95))
      val clampSum = sorted.map(c => math.max(p05, math.min(p95, c))).sum
      val (gn, g05, g95, gsum, gmean) = got(flag)
      assert((gn, g05, g95, gsum) === ((n, p05, p95, clampSum)), s"flag $flag")
      assert(gmean >= p05 && gmean <= p95, "winsorized mean escaped bounds")
      // clamping is live at this sf: some value actually moved
      assert(vs.exists(v => v._2 < p05 || v._2 > p95))
    }
  }

  test("mann-whitney doubled-U equals a driver-side rank computation") {
    val row = AnalyticsQueries.mannWhitney(spark, sf).collect().head
    val (nA, nB, raX2, uAX2, uBX2) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getLong(4))
    val vals = graft.Tables.orders(spark, sf)
      .where(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .selectExpr("cast(cast(o_totalprice as decimal(18,2)) * 100 as long)",
        "o_orderpriority = '1-URGENT'")
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    val sorted = vals.sortBy(_._1)
    // doubled average rank per tie-group keeps everything integral
    val r2ByVal = sorted.map(_._1).zipWithIndex.groupBy(_._1)
      .map { case (v, idx) => (v, idx.map(_._2 + 1L).sum * 2 / idx.length) }
    val wantRaX2 = vals.filter(_._2).map(v => r2ByVal(v._1)).sum
    val wantNA = vals.count(_._2).toLong
    val wantNB = vals.length - wantNA
    assert((nA, nB) === (wantNA, wantNB))
    assert(raX2 === wantRaX2)
    assert(uAX2 === wantRaX2 - wantNA * (wantNA + 1))
    assert(uAX2 + uBX2 === 2 * wantNA * wantNB)
    // both samples are live and U is inside its range
    assert(wantNA > 0 && wantNB > 0)
    assert(uAX2 >= 0 && uAX2 <= 2 * wantNA * wantNB)
  }

  test("benford: shares sum to ~1e6 and deviations replay from raw counts") {
    val rows = AnalyticsQueries.benford(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).sorted.toSeq === (1L to 9L), "all nine digits live")
    val total = rows.map(_._2).sum
    rows.foreach { case (_, n, obsPpm, expPpm, devPpm) =>
      assert(obsPpm === n * 1000000L / total)
      assert(devPpm === math.abs(obsPpm - expPpm))
    }
    // floor-divided shares sum to at most 1e6 (and close to it)
    val s = rows.map(_._3).sum
    assert(s <= 1000000L && s > 1000000L - 9)
  }

  test("peak concurrency equals a brute global sweep-line replay") {
    val got = AnalyticsQueries.peakConcurrency(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ts = graft.Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) as t").collect().map(_.getLong(0))
    val ttl = 300L * 1000000L
    val deltas = (ts.map(_ -> 1L) ++ ts.map(t => (t + ttl) -> -1L))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    var cum = 0L
    val want = deltas.map { case (t, w) => cum += w; (t / 86400000000L, cum) }
      .groupBy(_._1).map { case (day, xs) =>
        day -> (xs.length.toLong, xs.map(_._2).max)
      }
    assert(got === want)
    assert(got.values.exists(_._2 > 1L), "no overlapping activity anywhere")
  }

  test("revenue drawdown equals a brute running-max replay per month") {
    val got = AnalyticsQueries.revenueDrawdown(spark, sf).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val daily = graft.Tables.orders(spark, sf)
      .selectExpr("cast(date_trunc('month', o_orderdate) as date) as m",
        "cast(o_orderdate as date) as day",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as long) as c")
      .groupBy("m", "day")
      .agg(org.apache.spark.sql.functions.sum("c").as("cents"))
      .collect().map(r => (r.getDate(0).toString, r.getDate(1).toString, r.getLong(2)))
    val want = daily.groupBy(_._1).map { case (m, xs) =>
      val series = xs.sortBy(_._2).map(_._3)
      var peak = Long.MinValue; var dd = 0L
      series.foreach { v => peak = math.max(peak, v); dd = math.max(dd, peak - v) }
      m -> (series.length.toLong, series.max, dd)
    }
    assert(got === want)
    assert(got.values.exists(_._3 > 0L), "no drawdown anywhere")
  }

  test("fulfilment latency: quantiles ordered, orders conserved per priority") {
    val rows = AnalyticsQueries.fulfilmentLatency(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (p, (n, mn, med, p90, mx)) =>
      assert(n > 0)
      assert(mn <= med && med <= p90 && p90 <= mx, s"$p quantiles out of order")
    }
    // q82 established some orders have NO line items — those drop out
    val ordersWithItems = graft.Tables.orders(spark, sf)
      .join(graft.Tables.lineitem(spark, sf)
          .select("l_orderkey").distinct(),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"))
      .count()
    assert(rows.map(_._2._1).sum === ordersWithItems,
      "every order with line items gets a slowest-line ship date")
  }

  test("lift chart conserves users/responders and ends at lift exactly 1e6") {
    val rows = AnalyticsQueries.liftChart(spark, sf)
      .orderBy("decile").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty && rows.map(_._1).distinct.length === rows.length)
    val users = graft.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val responders = graft.Tables.events(spark, sf)
      .where(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(rows.map(_._2).sum === users, "user conservation")
    assert(rows.map(_._3).sum === responders, "responder conservation")
    rows.foreach { case (d, n, r, ppm, _) =>
      assert(d >= 1 && d <= 10)
      assert(r <= n && ppm === r * 1000000L / n)
    }
    // the full-population cumulative lift is 1e6 by definition
    assert(rows.last._5 === 1000000L)
  }

  test("quantile norm: deciles partition each source; norm_len is the global decile boundary") {
    val rows = AnalyticsQueries.quantileNorm(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    val lens = rows.map(_._3).sorted
    // global lower-discrete decile boundaries, brute
    val n = lens.length
    def bound(i: Int): Long =
      if (i == 10) lens.last
      else lens.find(v => lens.count(_ <= v) * 10 >= n.toLong * i).get
    rows.foreach { case (id, src, len, dec, norm) =>
      assert(dec >= 1 && dec <= 10, s"doc $id decile")
      assert(norm === bound(dec.toInt), s"doc $id norm_len")
    }
    // within each source, deciles are monotone in length
    rows.groupBy(_._2).foreach { case (src, xs) =>
      val sorted = xs.sortBy(_._3)
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        assert(a._4 <= b._4, s"$src deciles not monotone in length")
      }
    }
    // every document survives
    val total = graft.Tables.documents(spark, sf).count()
    assert(rows.length.toLong === total)
  }

  test("gini equals the brute sorted-rank formula per segment") {
    val out = AnalyticsQueries.gini(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val spend = graft.Tables.orders(spark, sf)
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("o_custkey").agg(sum("c").as("cents"))
      .join(graft.Tables.customer(spark, sf).select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment", "cents").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(out.keySet === spend.map(_._1).toSet)
    spend.groupBy(_._1).foreach { case (seg, xs) =>
      val v = xs.map(_._2).sorted
      val n = BigInt(v.length)
      val sumX = v.map(BigInt(_)).sum
      val sumIx = v.zipWithIndex.map { case (x, i) => BigInt(i + 1) * x }.sum
      val g = ((2 * sumIx - (n + 1) * sumX) * 1000000) / (n * sumX)
      val (qn, qs, qg) = out(seg)
      assert(qn === v.length, s"$seg n")
      assert(BigInt(qs) === sumX, s"$seg spend")
      assert(BigInt(qg) === g, s"$seg gini")
      assert(qg >= 0L && qg < 1000000L)
    }
  }

  test("abc classes: cumulative share monotone, thresholds honored, all classes live") {
    val rows = AnalyticsQueries.abcClasses(spark, sf)
      .orderBy(col("cents").desc, col("p_brand")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.nonEmpty)
    var prev = 0L
    rows.foreach { case (brand, _, cum, cls) =>
      assert(cum >= prev, s"$brand cum_ppm not monotone")
      prev = cum
      val want = if (cum <= 700000) "A" else if (cum <= 900000) "B" else "C"
      assert(cls === want, s"$brand class")
    }
    assert(rows.last._3 === 1000000L, "final cumulative share is exactly 1e6")
    assert(rows.map(_._4).toSet === Set("A", "B", "C"), "all three classes live")
  }

  test("hhi equals the brute share-square sum and respects its bounds") {
    val out = AnalyticsQueries.hhi(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val per = graft.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .groupBy("l_suppkey").agg(sum("c").as("cents"))
      .join(graft.Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(graft.Tables.nation(spark, sf).select("n_nationkey", "n_regionkey"),
        col("s_nationkey") === col("n_nationkey"))
      .join(graft.Tables.region(spark, sf).select("r_regionkey", "r_name"),
        col("n_regionkey") === col("r_regionkey"))
      .select("r_name", "cents").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    per.groupBy(_._1).foreach { case (region, xs) =>
      val cents = xs.map(_._2)
      val rtot = BigInt(cents.sum)
      val shares = cents.map(c => BigInt(c) * 1000000 / rtot)
      val hhi = shares.map(s => s * s).sum / 1000000
      val (qn, qh) = out(region)
      assert(qn === cents.length, s"$region n_suppliers")
      assert(BigInt(qh) === hhi, s"$region hhi")
      // equal shares floor 1e6/n (minus truncation slack); monopoly tops at 1e6
      assert(qh >= 1000000L / qn - qn && qh <= 1000000L)
    }
  }

  test("anomaly days equal a brute trailing-window z-score recompute") {
    val got = AnalyticsQueries.anomalyDays(spark, sf).collect()
      .map(r => r.getDate(0).toString -> (r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val daily = graft.Tables.orders(spark, sf)
      .selectExpr("cast(o_orderdate as date) as day",
        "cast(o_totalprice as decimal(18,2)) * 100 as c")
      .collect().groupBy(_.getDate(0).toString)
      .map { case (day, rows) =>
        day -> rows.map(r => BigInt(r.getDecimal(1).unscaledValue())).sum / 100 / 100000
      }.toSeq.sortBy(_._1).map { case (d, r) => (d, r.toLong) }
    val want = daily.indices.flatMap { i =>
      if (i < 30) None
      else {
        val (day, x) = daily(i)
        val win = daily.slice(i - 30, i).map(_._2)
        val (s1, s2) = (win.sum, win.map(v => v * v).sum)
        val dev = 30 * x - s1
        if (dev * dev > 9 * (30 * s2 - s1 * s1))
          Some(day -> (x, s1 / 30, dev > 0))
        else None
      }
    }.toMap
    assert(got === want)
    assert(got.nonEmpty, "no 3-sigma revenue days in the corpus")
    // the integer rewrite is exactly z^2 > 9: spot-check one flagged day
    // against the float z-score
    val (day, (x, _, _)) = got.head
    val i = daily.indexWhere(_._1 == day)
    val win = daily.slice(i - 30, i).map(_._2.toDouble)
    val mu = win.sum / 30
    val sigma = math.sqrt(win.map(v => (v - mu) * (v - mu)).sum / 30)
    assert(math.abs(x - mu) > 3 * sigma - 1e-6)
  }
}
