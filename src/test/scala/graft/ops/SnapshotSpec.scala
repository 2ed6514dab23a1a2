package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class SnapshotSpec extends SparkSpec {

  test("q130 incremental partial-merge equals the direct full aggregate") {
    val direct = Tables.orders(spark, sf)
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val got = SnapshotQueries.incrementalAgg(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got === direct)
  }

  test("q134 classifies exactly the constructed mutations") {
    val keys = Tables.orders(spark, sf).select(col("o_orderkey").as("k"))
    def n(c: org.apache.spark.sql.Column): Long = keys.where(c).count()
    val removed = n(col("k") % 97 === 0)
    val added = n(col("k") % 101 === 0)
    val changed = n(col("k") % 5 === 0 && col("k") % 97 =!= 0)
    val unchanged = keys.count() - removed - changed
    val got = SnapshotQueries.snapshotDiff(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.getOrElse("removed", 0L) === removed)
    assert(got.getOrElse("added", 0L) === added)
    assert(got.getOrElse("changed", 0L) === changed)
    assert(got.getOrElse("unchanged", 0L) === unchanged)
    // every classification non-degenerate at every sf (97/101/5 all hit)
    assert(Seq("removed", "added", "changed", "unchanged").forall(got.contains))
  }

  test("q135 mergeSchema read loses no rows and null-fills the legacy epoch") {
    val o = Tables.orders(spark, sf)
    val total = o.count()
    val legacy = o.where(coalesce(year(col("o_orderdate")) <= 1996, lit(false))).count()
    val rows = SnapshotQueries.schemaEvolution(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows("LEGACY")._1 === legacy) // missing column → null → LEGACY bucket
    assert(rows.values.map(_._1).sum === total) // union of epochs is lossless
    assert(rows.keySet.size > 1) // the evolved epoch contributes real groups
  }

  test("range digest equals a driver-side replay and flags any row change") {
    val got = SnapshotQueries.rangeDigest(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val rows = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity").cast("decimal(18,2)") * 100).cast("long"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
      .collect()
      .map(r => (r.getLong(0), s"${r.getLong(0)}|${r.getInt(1)}|${r.getLong(2)}|${r.getLong(3)}"))
    val want = rows.groupBy(_._1 / 2000).map { case (b, grp) =>
      val hs = grp.map(g => h60(g._2))
      b -> (grp.length.toLong, hs.reduce(_ ^ _), hs.map(_ % 1000000007L).sum)
    }
    assert(got === want)
    // sensitivity: perturbing one row's cents moves that bucket's digests
    val (b0, s0) = rows.head
    val changed = h60(s0.dropRight(1) + (s0.last.asDigit + 1) % 10)
    val (_, x0, m0) = want(b0 / 2000)
    assert((x0 ^ h60(s0) ^ changed) != x0)
    assert(m0 - h60(s0) % 1000000007L + changed % 1000000007L != m0)
  }

  test("delta-join view: every delta term is live and the merge is exact") {
    val got = SnapshotQueries.deltaJoinView(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val orders = graft.Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "cast(cast(o_totalprice as decimal(18,2)) * 100 as long) as c",
        "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cust = graft.Tables.customer(spark, sf)
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = orders.groupBy(o => cust(o._1)).map { case (seg, os) =>
      seg -> (os.length.toLong, os.map(_._2).sum)
    }
    assert(got === want)
    // the parity epochs that drive the four-term expansion are all live
    assert(orders.exists(_._3 % 2 == 0) && orders.exists(_._3 % 2 == 1))
    assert(cust.keys.exists(_ % 2 == 0) && cust.keys.exists(_ % 2 == 1))
  }

  test("order aging buckets partition the open orders with consistent age bounds") {
    val rows = SnapshotQueries.orderAging(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (bucket, n, cents, mn, mx) =>
      assert(mn >= bucket * 30 && mx < (bucket + 1) * 30,
        s"bucket $bucket holds ages [$mn,$mx]")
      assert(n > 0 && cents > 0 && mn <= mx)
    }
    val open = graft.Tables.orders(spark, sf)
      .where("o_orderstatus = 'O'").count()
    assert(rows.map(_._2).sum === open, "every open order lands in one bucket")
    assert(rows.length > 1, "aging spread covers multiple buckets")
  }

  test("constraint audit: 14 rules, invariants pass, screens fire, brute counts match") {
    val rows = SnapshotQueries.constraintAudit(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) ->
        (r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(rows.size === 14, s"expected 14 rules, got ${rows.size}")
    rows.foreach { case (k, (n, v, pass)) =>
      assert(v >= 0 && v <= n, s"$k: violations $v outside [0, $n]")
      assert(pass === (v == 0), s"$k: pass verdict inconsistent")
    }
    // corpus invariants hold: completeness, uniqueness, FK, bounds
    Seq(("events", "user_id", "not_null"), ("events", "event_id", "unique"),
      ("orders", "o_orderkey", "unique"), ("lineitem", "l_orderkey", "fk_orders"),
      ("lineitem", "l_quantity", "between_1_50"),
      ("documents", "n_chars", "equals_length_text")).foreach { k =>
      assert(rows(k)._3, s"$k should pass on this corpus")
    }
    // the screens genuinely fire — an all-green audit is untested wiring
    Seq(("orders", "o_totalprice", "ceiling_400000"),
      ("lineitem", "l_discount", "cap_0_08"),
      ("documents", "lang", "in_allowed_set")).foreach { k =>
      assert(!rows(k)._3 && rows(k)._2 > 0, s"$k should fire on this corpus")
    }
    // brute recount of one firing rule
    val disc = Tables.lineitem(spark, sf).where("l_discount > 0.08").count()
    assert(rows(("lineitem", "l_discount", "cap_0_08"))._2 === disc)
    // n_checked is the table cardinality on every rule of that table
    val nLi = Tables.lineitem(spark, sf).count()
    rows.collect { case ((t, _, _), (n, _, _)) if t == "lineitem" => n }
      .foreach(n => assert(n === nLi))
    // one-pass economics: each table's rules fuse into a single scan —
    // events and documents appear exactly once in the physical plan
    val plan = SnapshotQueries.constraintAudit(spark, sf)
      .queryExecution.executedPlan.toString
    assert("events\\.parquet".r.findAllIn(plan).size === 1, "events scanned more than once")
    assert("documents\\.parquet".r.findAllIn(plan).size === 1, "documents scanned more than once")
  }

  test("erasure audit: cascade subjects consistent, forget-set fully represented") {
    val rows = SnapshotQueries.erasureAudit(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet === Set("events", "customer", "orders", "lineitem"))
    val forget = graft.Tables.events(spark, sf)
      .select("user_id").distinct().where("user_id % 13 = 0").count()
    assert(forget > 0, "forget-set empty at this sf")
    // every forget user appears in events (the set is drawn from events)
    assert(rows("events")._2 === forget)
    // customer purges exactly one row per matched subject
    assert(rows("customer")._1 === rows("customer")._2)
    // the cascade cannot reach more subjects than place orders
    assert(rows("lineitem")._2 <= rows("orders")._2)
    rows.values.foreach { case (n, s2) => assert(n >= s2) }
  }
}
