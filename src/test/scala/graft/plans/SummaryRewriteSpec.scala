package graft.plans

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** The materialized-view rewrite's contract: a qualifying aggregate
  * scans ONLY the summary, every non-qualifying shape is left alone,
  * and on/off answers are identical (the oracle proves exactness
  * against DuckDB; these pin the plan-level behavior a hash can't).
  */
class SummaryRewriteSpec extends SparkSpec {

  private def enable(): Unit = {
    graft.ops.Scale.ensureLineitemSummary(spark, sf): Unit
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
  }

  private def naturalAgg = Tables.lineitem(spark, sf)
    .groupBy("l_returnflag")
    .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
      min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))

  test("qualifying aggregate scans the summary, not the fact table") {
    enable()
    try {
      val plan = naturalAgg.queryExecution.executedPlan.toString
      assert(plan.contains("graft-lineitem-summary"), plan.take(1500))
      assert(!plan.contains("lineitem.parquet"),
        "rewritten plan still scans the fact table")
      // answers identical with the rule off
      val on = naturalAgg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = naturalAgg.collect().map(_.toString).sorted.toSeq
      assert(off.nonEmpty && on === off)
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("multi-column grain + AVG: scans summary2, answers bit-identical") {
    graft.ops.Scale.ensureLineitemSummary2(spark, sf): Unit
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def multiAgg = Tables.lineitem(spark, sf)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          avg("l_partkey").as("avg_part"))
      val plan = multiAgg.queryExecution.executedPlan.toString
      assert(plan.contains("graft-lineitem-summary2"), plan.take(1500))
      assert(!plan.contains("lineitem.parquet"),
        "rewritten multi-grain plan still scans the fact table")
      val on = multiAgg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = multiAgg.collect().map(_.toString).sorted.toSeq
      // AVG must be BIT-identical (sum/n double division == Average for
      // integral inputs), not merely within float tolerance
      assert(off.nonEmpty && on === off)
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("grain roll-up: subset grouping re-aggregates the summary") {
    graft.ops.Scale.ensureLineitemSummary2(spark, sf): Unit
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def rollup = Tables.lineitem(spark, sf)
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          avg("l_partkey").as("avg_part"),
          countDistinct(col("l_returnflag")).as("n_flags"))
      val plan = rollup.queryExecution.executedPlan.toString
      assert(plan.contains("graft-lineitem-summary2"), plan.take(1500))
      assert(!plan.contains("lineitem.parquet"),
        "roll-up must re-aggregate the summary, not re-scan the fact table")
      val on = rollup.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = rollup.collect().map(_.toString).sorted.toSeq
      // counts, sums, the AVG division AND the distinct-over-grain
      // count must all be bit-identical to the fact recompute
      assert(off.nonEmpty && on === off)
      // COUNT(DISTINCT x) for x OUTSIDE the grain cannot roll up
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      val ndOrder = Tables.lineitem(spark, sf)
        .groupBy("l_linestatus")
        .agg(countDistinct(col("l_orderkey")).as("nd"))
      assert(ndOrder.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("incremental refresh serves the merged summary; refresh plan is delta-sized") {
    val incrPath = graft.ops.Scale.ensureLineitemSummaryIncremental(spark, sf)
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      val plan = naturalAgg.queryExecution.executedPlan.toString
      // the incremental ensure registered LAST for this grain, so the
      // rewrite serves the incrementally-refreshed summary
      assert(plan.contains("graft-lineitem-summary-incr"), plan.take(1500))
      assert(!plan.contains("lineitem.parquet"))
      // the refreshed summary must equal the full recompute EXACTLY
      val viaIncr = naturalAgg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val full = naturalAgg.collect().map(_.toString).sorted.toSeq
      assert(full.nonEmpty && viaIncr === full)
      // and the materialized incr summary itself carries the same rows
      val stored = spark.read.parquet(incrPath)
        .select("l_returnflag", "n", "key_checksum", "min_part", "max_part")
        .collect().map(_.toString).sorted.toSeq
      assert(stored === full)
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      // restore the full summary as the registered entry for the grain
      // (q240's plan pin in the first test depends on which ensure ran
      // last only within ITS OWN scope — re-register to be tidy)
      graft.ops.Scale.ensureLineitemSummary(spark, sf): Unit
    }
  }

  test("delete-bearing refresh: signed merge + grain-bounded repair == full recompute") {
    val path = graft.ops.Scale.ensureLineitemSummaryDeletes(spark, sf)
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      val plan = naturalAgg.queryExecution.executedPlan.toString
      // the delete-bearing ensure registered LAST for this grain
      assert(plan.contains("graft-lineitem-summary-delincr"), plan.take(1500))
      assert(!plan.contains("lineitem.parquet"))
      val viaDel = naturalAgg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val full = naturalAgg.collect().map(_.toString).sorted.toSeq
      assert(full.nonEmpty && viaDel === full)
      // the materialized refreshed summary itself carries exactly the
      // full-recompute rows (deletes subtracted, min/max repaired)
      val stored = spark.read.parquet(path)
        .select("l_returnflag", "n", "key_checksum", "min_part", "max_part")
        .collect().map(_.toString).sorted.toSeq
      assert(stored === full)
      // the deletes touch a STRICT subset of the grains, and the
      // MIN/MAX repair scan is bounded to exactly those grain values —
      // the grain predicate is PUSHED to the parquet scan, so untouched
      // grains are never rescanned by the refresh
      val touched = graft.ops.Scale.deleteTouchedGrains(spark, sf)
      val allGrains = Tables.lineitem(spark, sf)
        .select("l_returnflag").distinct().count()
      assert(touched.nonEmpty && touched.size < allGrains,
        s"delta must touch a strict subset of grains (touched=$touched)")
      val repairPlan = graft.ops.Scale.minMaxRepairScan(spark, sf, touched)
        .queryExecution.executedPlan.toString
      assert(repairPlan.contains("PushedFilters"), repairPlan.take(1500))
      assert(repairPlan.contains("In(l_returnflag") ||
        repairPlan.contains("EqualTo(l_returnflag"),
        "repair scan's grain filter not pushed:\n" + repairPlan.take(1500))
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      graft.ops.Scale.ensureLineitemSummary(spark, sf): Unit
    }
  }

  test("stale fingerprint or missing summary path declines, never throws") {
    import SummaryRewrite._
    enable()
    try {
      val src = Tables.lineitem(spark, sf).inputFiles.head
        .replaceAll("/[^/]*$", "") // not the registry key; use the real one
      // find the registered source key for lineitem
      val key = {
        val it = registry.keys()
        var found: String = null
        while (it.hasMoreElements) {
          val k = it.nextElement()
          if (k.contains("lineitem")) found = k
        }
        assert(found != null, s"no lineitem entry registered (src guess was $src)")
        found
      }
      val real = registry.get(key).find(_.groupCols == Seq("l_returnflag")).get
      // 1) freshness probe fails ⇒ the qualifying aggregate stays on
      //    the fact table (a regenerated corpus must never be answered
      //    from the old summary, even before re-registration)
      register(key, real.copy(stillFresh = () => false))
      assert(naturalAgg.queryExecution.executedPlan.toString
        .contains("lineitem.parquet"), "stale summary was served")
      // 2) summary dir gone (no _SUCCESS) ⇒ decline, no planning-time
      //    exception
      register(key, real.copy(location =
        SummaryLocation.FixedPath("/nonexistent/graft-summary")))
      val plan = naturalAgg.queryExecution.executedPlan.toString
      assert(plan.contains("lineitem.parquet"))
      naturalAgg.collect(): Unit // and it still ANSWERS
      // restore
      register(key, real)
      assert(!naturalAgg.queryExecution.executedPlan.toString
        .contains("lineitem.parquet"))
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("PointerStore summaries serve exactly the committed version") {
    import SummaryRewrite._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(Tables.scratchDir), "graft-mvptr-")
    val srcPath = base.resolve("src").toString
    try {
      Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("user_id", "cents")
        .repartition(1).write.parquet(srcPath)
      val root = base.resolve("table")
      java.nio.file.Files.createDirectories(root)
      // versions carry DELIBERATELY different numbers than the fact
      // recompute, so the result proves which store answered
      Seq((1L, 200L, 3000L), (2L, 100L, 500L))
        .toDF("user_id", "n_events", "total_cents")
        .repartition(1).write.parquet(root.resolve("v0").toString)
      Seq((1L, 400L, 6000L), (2L, 200L, 1000L), (3L, 1L, 1L))
        .toDF("user_id", "n_events", "total_cents")
        .repartition(1).write.parquet(root.resolve("v1").toString)
      // commits go through the pointer store's put-if-absent manifest
      // protocol (no CURRENT file) — retain=3 keeps v0/v1/v9 manifests
      // alive so every flip below stays resolvable
      def setCurrent(v: String): Unit =
        graft.store.ManifestStore.commitPointer(root, v, retain = 3)
      val key = graft.ops.Scale.sourcePathOf(spark.read.parquet(srcPath))
      register(key, Summary(
        SummaryLocation.PointerStore(root.toString), Seq("user_id"),
        Map(CountStar -> "n_events", SumCol("cents") -> "total_cents")))
      SummaryRewrite.install(spark)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      def agg = spark.read.parquet(srcPath).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"), sum("cents").as("total_cents"))
      def rows = agg.collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // no CURRENT yet (no commit ever happened): decline to the fact
      assert(agg.queryExecution.executedPlan.toString.contains("src"))
      assert(rows === Map(1L -> ((2L, 30L)), 2L -> ((1L, 5L))))
      // CURRENT → v0: exactly v0's rows, and ONLY v0 in the plan
      setCurrent("v0")
      val p0 = agg.queryExecution.executedPlan.toString
      assert(p0.contains("/v0") && !p0.contains("/v1"))
      assert(rows === Map(1L -> ((200L, 3000L)), 2L -> ((100L, 500L))))
      // pointer flip → v1 becomes visible at exactly the flip (the
      // relation cache must not pin the superseded version)
      setCurrent("v1")
      val p1 = agg.queryExecution.executedPlan.toString
      assert(p1.contains("/v1") && !p1.contains("/v0"))
      assert(rows === Map(1L -> ((400L, 6000L)), 2L -> ((200L, 1000L)),
        3L -> ((1L, 1L))))
      // pointer naming a missing version dir (torn state): decline
      setCurrent("v9")
      assert(agg.queryExecution.executedPlan.toString.contains("src"))
      assert(rows === Map(1L -> ((2L, 30L)), 2L -> ((1L, 5L))))
      registry.remove(key): Unit
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      Tables.deleteRecursively(base.toFile)
    }
  }

  test("global (no GROUP BY) aggregate rolls up; empty table answers 0") {
    import SummaryRewrite._
    import spark.implicits._
    graft.ops.Scale.ensureLineitemSummary2(spark, sf): Unit
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def global = Tables.lineitem(spark, sf).agg(
        count(lit(1)).as("n"), sum("l_orderkey").as("ks"),
        avg("l_partkey").as("ap"),
        countDistinct(col("l_linestatus")).as("ns"))
      val plan = global.queryExecution.executedPlan.toString
      assert(plan.contains("graft-lineitem-summary2"), plan.take(1500))
      assert(!plan.contains("lineitem.parquet"))
      val on = global.collect().map(_.toString).toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = global.collect().map(_.toString).toSeq
      assert(on === off)
      // EMPTY fact table: a global COUNT over it is 0 (one row), and
      // the roll-up over its empty summary must say the same — the
      // coalesce in the Count roll-up is what prevents NULL here
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      val base = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(Tables.scratchDir), "graft-mvempty-")
      try {
        val srcPath = base.resolve("src").toString
        Seq.empty[(Long, Long)].toDF("g", "x")
          .repartition(1).write.parquet(srcPath)
        val sumPath = base.resolve("sum").toString
        spark.read.parquet(srcPath).groupBy("g")
          .agg(count(lit(1)).as("n"), sum("x").as("sum_x"),
            count(col("x")).as("cnt_x"))
          .repartition(1).write.parquet(sumPath)
        val key = graft.ops.Scale.sourcePathOf(spark.read.parquet(srcPath))
        register(key, Summary(SummaryLocation.FixedPath(sumPath), Seq("g"),
          Map(CountStar -> "n", SumCol("x") -> "sum_x", CountCol("x") -> "cnt_x")))
        def emptyGlobal = spark.read.parquet(srcPath)
          .agg(count(lit(1)).as("n"), count(col("x")).as("nn"),
            sum("x").as("sx"), avg("x").as("ax"))
        assert(!emptyGlobal.queryExecution.executedPlan.toString.contains("src"))
        val row = emptyGlobal.collect()(0)
        assert(row.getLong(0) === 0L && row.getLong(1) === 0L)
        assert(row.isNullAt(2) && row.isNullAt(3)) // SUM/AVG over empty: NULL, like the fact scan
        registry.remove(key): Unit
      } finally Tables.deleteRecursively(base.toFile)
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("grain-column WHERE replays over the summary; non-grain WHERE declines") {
    graft.ops.Scale.ensureLineitemSummary2(spark, sf): Unit
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def filtered = Tables.lineitem(spark, sf)
        .where(col("l_returnflag") === "R")
        .groupBy("l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("ks"),
          avg("l_partkey").as("ap"))
      val plan = filtered.queryExecution.executedPlan.toString
      assert(plan.contains("graft-lineitem-summary2"), plan.take(1500))
      assert(!plan.contains("lineitem.parquet"))
      val on = filtered.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = filtered.collect().map(_.toString).sorted.toSeq
      assert(off.nonEmpty && on === off)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      // grain-predicate + EXACT-grain grouping (direct mode) works too
      val direct = Tables.lineitem(spark, sf)
        .where(col("l_linestatus") === "F")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
      assert(!direct.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
      // a predicate on a NON-grain column cannot commute with the grain
      val nonGrain = Tables.lineitem(spark, sf)
        .where(col("l_quantity") > 10)
        .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
      assert(nonGrain.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
      // a non-deterministic predicate declines even when its column
      // references are grain-only (uuid() survives optimization, where
      // a tautological rand() comparison gets folded away upstream)
      val nonDet = Tables.lineitem(spark, sf)
        .where(col("l_returnflag") === "R" && expr("uuid() != 'nope'"))
        .groupBy("l_linestatus").agg(count(lit(1)).as("n"))
      assert(nonDet.queryExecution.executedPlan.toString.contains("lineitem.parquet"))
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("join-MV: aggregate over customer ⋈ orders scans only the summary") {
    graft.ops.Scale.ensureSegmentOrdersSummary(spark, sf): Unit
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def joined = Tables.customer(spark, sf).join(Tables.orders(spark, sf),
          col("c_custkey") === col("o_custkey"))
      def agg = joined.groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("ks"),
          avg("o_custkey").as("ac"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.contains("graft-seg-orders-summary"), plan.take(1500))
      assert(!plan.contains("customer.parquet") && !plan.contains("orders.parquet"),
        "join-MV plan must scan neither base table")
      val on = agg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = agg.collect().map(_.toString).sorted.toSeq
      assert(off.nonEmpty && on === off)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      // GLOBAL roll-up through the join-MV: no grouping at all —
      // plan pinned AND value-equal to the fact recompute
      def global = joined.agg(count(lit(1)).as("n"), sum("o_orderkey").as("ks"))
      val gPlan = global.queryExecution.executedPlan.toString
      assert(gPlan.contains("graft-seg-orders-summary") &&
        !gPlan.contains("orders.parquet"))
      val gOn = global.collect().map(_.toString).toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val gOff = global.collect().map(_.toString).toSeq
      assert(gOn === gOff)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      // the commuted orientation (orders ⋈ customer) qualifies too —
      // plan pinned AND value-equal (a crossed leftKey/rightKey filter
      // could serve the right summary scan with the wrong mapping)
      def swapped = Tables.orders(spark, sf).join(Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(swapped.queryExecution.executedPlan.toString
        .contains("graft-seg-orders-summary"))
      val sOn = swapped.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val sOff = swapped.collect().map(_.toString).sorted.toSeq
      assert(sOn === sOff)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      // grain-column WHERE on the dimension side replays over the
      // summary — plan pinned AND value-equal
      def segFiltered = Tables.customer(spark, sf)
        .where(col("c_mktsegment") === "BUILDING")
        .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val fPlan = segFiltered.queryExecution.executedPlan.toString
      assert(fPlan.contains("graft-seg-orders-summary") &&
        !fPlan.contains("orders.parquet"), fPlan.take(1200))
      val fOn = segFiltered.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val fOff = segFiltered.collect().map(_.toString).sorted.toSeq
      assert(fOn.nonEmpty && fOn === fOff)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      // a JOIN-KEY filter is NOT a grain predicate — declines (it
      // changes the join membership inside grain groups)
      val keyFiltered = Tables.customer(spark, sf)
        .where(col("c_custkey") > 100)
        .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(keyFiltered.queryExecution.executedPlan.toString
        .contains("orders.parquet"))
      // DECLINES: a different equi key is a different join
      val wrongKey = Tables.customer(spark, sf).join(Tables.orders(spark, sf),
          col("c_custkey") === col("o_orderkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(wrongKey.queryExecution.executedPlan.toString.contains("orders.parquet"))
      // a side filter beyond the inferred IsNotNull(joinKey) declines
      val filteredSide = Tables.customer(spark, sf)
        .where(col("c_acctbal") > 0)
        .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(filteredSide.queryExecution.executedPlan.toString
        .contains("orders.parquet"))
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("incremental join-MV refresh serves the merged summary, equals full recompute") {
    val incrPath = graft.ops.Scale.ensureSegmentOrdersSummaryIncremental(spark, sf)
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def agg = Tables.customer(spark, sf).join(Tables.orders(spark, sf),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("ks"),
          avg("o_custkey").as("ac"))
      val plan = agg.queryExecution.executedPlan.toString
      // the incremental ensure registered LAST for this source/key/grain
      assert(plan.contains("graft-seg-orders-incr"), plan.take(1500))
      assert(!plan.contains("customer.parquet") && !plan.contains("orders.parquet"))
      val viaIncr = agg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val full = agg.collect().map(_.toString).sorted.toSeq
      assert(full.nonEmpty && viaIncr === full)
      // and the materialized incr summary itself carries the full-join
      // partials exactly
      val stored = spark.read.parquet(incrPath)
      val recomputed = Tables.customer(spark, sf).join(Tables.orders(spark, sf),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"),
          sum("o_custkey").as("sum_cust"), count(col("o_custkey")).as("cnt_cust"))
      assert(stored.collect().map(_.toString).sorted.toSeq ===
        recomputed.collect().map(_.toString).sorted.toSeq)
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      // restore the full summary as the registered entry for the shape
      graft.ops.Scale.ensureSegmentOrdersSummary(spark, sf): Unit
    }
  }

  test("chain-MV: 3-table aggregate scans only the summary; wrong chains decline") {
    graft.ops.Scale.ensureLineitemSegmentSummary(spark, sf): Unit
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def chainAgg = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          avg("l_partkey").as("avg_part"))
      val plan = chainAgg.queryExecution.executedPlan.toString
      assert(plan.contains("graft-li-seg-summary"), plan.take(1500))
      Seq("lineitem.parquet", "orders.parquet", "customer.parquet").foreach(t =>
        assert(!plan.contains(t), s"chain rewrite still scans $t"))
      val on = chainAgg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = chainAgg.collect().map(_.toString).sorted.toSeq
      assert(off.nonEmpty && on === off)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      // the commuted chain — customer ⋈ orders ⋈ lineitem, the same
      // chain built from the other end — is served too (reversed match)
      val reversed = Tables.customer(spark, sf)
        .join(Tables.orders(spark, sf), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(reversed.queryExecution.executedPlan.toString
        .contains("graft-li-seg-summary"))
      // DECLINE: a WRONG key chain (l_partkey is not the registered key)
      val wrongKey = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_partkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(wrongKey.queryExecution.executedPlan.toString
        .contains("lineitem.parquet"), "wrong key chain was rewritten")
      // DECLINE: a non-left-deep association — lineitem ⋈ (orders ⋈
      // customer) is the same relation algebraically, but the
      // conservative matcher only accepts the registered left-deep
      // chain shape
      val bushy = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf)
            .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      assert(bushy.queryExecution.executedPlan.toString
        .contains("lineitem.parquet"), "bushy association was rewritten")
      // DECLINE: a chain over a different table set (supplier swapped in)
      val wrongTables = Tables.lineitem(spark, sf)
        .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
        .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name").agg(count(lit(1)).as("n"))
      assert(wrongTables.queryExecution.executedPlan.toString
        .contains("lineitem.parquet"))
      // grain-only filters replay over the chain summary like q251
      val filtered = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sf).where(col("c_mktsegment") =!= "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      val fPlan = filtered.queryExecution.executedPlan.toString
      assert(fPlan.contains("graft-li-seg-summary"), fPlan.take(1500))
      val fOn = filtered.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val fOff = filtered.collect().map(_.toString).sorted.toSeq
      assert(fOff.nonEmpty && fOn === fOff)
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("composite-MV refreshes (incremental + delete-bearing) serve the merged summary, equal full recompute") {
    def compositeAgg = Tables.lineitem(spark, sf)
      .join(spark.read.parquet(graft.ops.Scale.ensurePartsuppBridge(spark, sf)),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        sum("ps_cnt").as("sum_pscnt"))
    try {
      // thunked: each refresh must register IMMEDIATELY before its own
      // plan pin — an eager Seq would let the second registration win
      // the slot for both iterations
      Seq[(String, () => String)](
        ("graft-composite-incr",
          () => graft.ops.Scale.ensureCompositeJoinSummaryIncremental(spark, sf)),
        ("graft-composite-delincr",
          () => graft.ops.Scale.ensureCompositeJoinSummaryDeletes(spark, sf))
      ).foreach { case (marker, ensure) =>
        val path = ensure()
        SummaryRewrite.install(spark)
        spark.conf.set(SummaryRewrite.EnabledKey, "true")
        val plan = compositeAgg.queryExecution.executedPlan.toString
        // the refresh ensure registered LAST for this pair-set/grain, so
        // the rewrite serves the refreshed summary — scanning NEITHER
        // the fact nor the bridge
        assert(plan.contains(marker), plan.take(1500))
        assert(!plan.contains("lineitem.parquet") &&
          !plan.contains("graft-ps-bridge"), plan.take(1500))
        val on = compositeAgg.collect().map(_.toString).sorted.toSeq
        spark.conf.set(SummaryRewrite.EnabledKey, "false")
        val off = compositeAgg.collect().map(_.toString).sorted.toSeq
        assert(off.nonEmpty && on === off, s"$marker: rewrite changed the answer")
        // the materialized refresh itself carries the full recompute rows
        assert(spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
          === off, s"$marker: stored refresh diverges from full recompute")
      }
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      graft.ops.Scale.ensureCompositeJoinSummary(spark, sf): Unit
    }
  }

  test("snowflake-MV refreshes (incremental + delete-bearing) serve the merged summary, equal full recompute") {
    def snowAgg = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy("o_orderpriority", "p_type")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        sum("p_size").as("sum_size"))
    try {
      Seq[(String, () => String)](
        ("graft-snowflake-incr",
          () => graft.ops.Scale.ensureSnowflakeSummaryIncremental(spark, sf)),
        ("graft-snowflake-delincr",
          () => graft.ops.Scale.ensureSnowflakeSummaryDeletes(spark, sf))
      ).foreach { case (marker, ensure) =>
        val path = ensure()
        SummaryRewrite.install(spark)
        spark.conf.set(SummaryRewrite.EnabledKey, "true")
        val plan = snowAgg.queryExecution.executedPlan.toString
        assert(plan.contains(marker), plan.take(1500))
        Seq("lineitem.parquet", "orders.parquet", "part.parquet").foreach(t =>
          assert(!plan.contains(t), s"$marker rewrite still scans $t"))
        val on = snowAgg.collect().map(_.toString).sorted.toSeq
        spark.conf.set(SummaryRewrite.EnabledKey, "false")
        val off = snowAgg.collect().map(_.toString).sorted.toSeq
        assert(off.nonEmpty && on === off, s"$marker: rewrite changed the answer")
        assert(spark.read.parquet(path).collect().map(_.toString).sorted.toSeq
          === off, s"$marker: stored refresh diverges from full recompute")
      }
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      graft.ops.Scale.ensureSnowflakeSummary(spark, sf): Unit
    }
  }

  test("incremental chain refresh serves the merged summary, equals full recompute") {
    val incrPath = graft.ops.Scale.ensureLineitemSegmentSummaryIncremental(spark, sf)
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def chainAgg = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          avg("l_partkey").as("avg_part"))
      val plan = chainAgg.queryExecution.executedPlan.toString
      assert(plan.contains("graft-li-seg-incr"), plan.take(1500))
      Seq("lineitem.parquet", "orders.parquet", "customer.parquet").foreach(t =>
        assert(!plan.contains(t)))
      val viaIncr = chainAgg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val full = chainAgg.collect().map(_.toString).sorted.toSeq
      assert(full.nonEmpty && viaIncr === full)
      // the 7-term refresh materialization itself carries the same rows
      // (modulo AVG derivation): spot-check n/key_checksum
      val stored = spark.read.parquet(incrPath)
        .select("c_mktsegment", "n", "key_checksum")
        .collect().map(_.toString).sorted.toSeq
      val fullNK = chainAgg.select(col("c_mktsegment"), col("n"),
        col("key_checksum"))
      assert(stored === Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"))
        .collect().map(_.toString).sorted.toSeq)
      fullNK: Unit
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      graft.ops.Scale.ensureLineitemSegmentSummary(spark, sf): Unit
    }
  }

  test("delete-bearing chain refresh: pure signed merge == full 3-way recompute") {
    val path = graft.ops.Scale.ensureLineitemSegmentSummaryDeletes(spark, sf)
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def chainAgg = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          avg("l_partkey").as("avg_part"))
      val plan = chainAgg.queryExecution.executedPlan.toString
      assert(plan.contains("graft-li-seg-delincr"), plan.take(1500))
      Seq("lineitem.parquet", "orders.parquet", "customer.parquet").foreach(t =>
        assert(!plan.contains(t)))
      val viaDel = chainAgg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val full = chainAgg.collect().map(_.toString).sorted.toSeq
      assert(full.nonEmpty && viaDel === full)
      val stored = spark.read.parquet(path)
        .select("c_mktsegment", "n", "key_checksum")
        .collect().map(_.toString).sorted.toSeq
      assert(stored === Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"))
        .collect().map(_.toString).sorted.toSeq)
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      graft.ops.Scale.ensureLineitemSegmentSummary(spark, sf): Unit
    }
  }

  test("delete-bearing join-MV refresh: signed join merge + bounded repair == full") {
    val path = graft.ops.Scale.ensureSegmentOrdersSummaryDeletes(spark, sf)
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def joinAgg = Tables.customer(spark, sf).select("c_custkey", "c_mktsegment")
        .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"),
          min("o_custkey").as("min_cust"), max("o_custkey").as("max_cust"))
      val plan = joinAgg.queryExecution.executedPlan.toString
      assert(plan.contains("graft-seg-orders-delincr"), plan.take(1500))
      assert(!plan.contains("orders.parquet") && !plan.contains("customer.parquet"))
      val viaDel = joinAgg.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val full = joinAgg.collect().map(_.toString).sorted.toSeq
      assert(full.nonEmpty && viaDel === full)
      val stored = spark.read.parquet(path)
        .select("c_mktsegment", "n", "key_checksum", "min_cust", "max_cust")
        .collect().map(_.toString).sorted.toSeq
      assert(stored === full)
      // the measure SUPERSET contract: q250's AVG query must still be
      // served by this entry (it replaced q250/q252's registry slot)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      val avgQ = Tables.customer(spark, sf).join(Tables.orders(spark, sf),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"),
          avg("o_custkey").as("avg_cust"))
      assert(avgQ.queryExecution.executedPlan.toString
        .contains("graft-seg-orders-delincr"))
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      // deletes touch a strict subset of segments; the repair join's
      // dimension-side grain filter is pushed to the customer scan
      val touched = graft.ops.Scale.joinDeleteTouchedGrains(spark, sf)
      val allSegs = Tables.customer(spark, sf)
        .select("c_mktsegment").distinct().count()
      assert(touched.nonEmpty && touched.size < allSegs,
        s"deletes must touch a strict subset (touched=$touched)")
      val repairPlan = graft.ops.Scale.joinMinMaxRepairScan(spark, sf, touched)
        .queryExecution.executedPlan.toString
      assert(repairPlan.contains("PushedFilters"), repairPlan.take(1500))
      assert(repairPlan.contains("In(c_mktsegment") ||
        repairPlan.contains("EqualTo(c_mktsegment"),
        "repair join's grain filter not pushed:\n" + repairPlan.take(1500))
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      graft.ops.Scale.ensureSegmentOrdersSummary(spark, sf): Unit
    }
  }

  test("snowflake chain-MV: two dims off one fact served from the summary; wrong hop-2 key declines") {
    val path = graft.ops.Scale.ensureSnowflakeSummary(spark, sf)
    SummaryRewrite.install(spark)
    def snowAgg = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.part(spark, sf), col("l_partkey") === col("p_partkey"))
      .groupBy("o_orderpriority", "p_type")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        sum("p_size").as("sum_size"))
    try {
      val q = graft.ops.Scale.summarySnowflakeAggregate(spark, sf) // rewrite ON
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft-snowflake-summary"), plan.take(1500))
      assert(!plan.contains("lineitem.parquet") && !plan.contains("orders.parquet")
        && !plan.contains("part.parquet"),
        "rewritten snowflake plan still scans a base table:\n" + plan.take(1500))
      val on = q.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = snowAgg.collect().map(_.toString).sorted.toSeq
      assert(on.nonEmpty && on === off, "snowflake rewrite changed the answer")
      assert(off === spark.read.parquet(path)
        .select("o_orderpriority", "p_type", "n", "key_checksum", "sum_size")
        .collect().map(_.toString).sorted.toSeq)
      // a wrong second-hop key (suppkey instead of partkey) is a
      // different join and must scan, never be served
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      val wrong = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.part(spark, sf), col("l_suppkey") === col("p_partkey"))
        .groupBy("o_orderpriority", "p_type")
        .agg(count(lit(1)).as("n"))
      assert(!wrong.queryExecution.executedPlan.toString
        .contains("graft-snowflake-summary"),
        "wrong hop-2 key was wrongly served from the snowflake MV")
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("composite-key join-MV: served from the summary, neither side scanned; partial/crossed keys decline") {
    val path = graft.ops.Scale.ensureCompositeJoinSummary(spark, sf)
    val bridge = graft.ops.Scale.ensurePartsuppBridge(spark, sf)
    SummaryRewrite.install(spark)
    def compositeAgg = Tables.lineitem(spark, sf)
      .join(spark.read.parquet(bridge),
        col("l_partkey") === col("ps_partkey") &&
          col("l_suppkey") === col("ps_suppkey"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        sum("ps_cnt").as("sum_pscnt"))
    try {
      val q = graft.ops.Scale.summaryCompositeJoin(spark, sf) // sets rewrite ON
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft-composite-summary"), plan.take(1500))
      assert(!plan.contains("lineitem.parquet") && !plan.contains("graft-ps-bridge"),
        "rewritten plan still scans a join side:\n" + plan.take(1500))
      val on = q.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = compositeAgg.collect().map(_.toString).sorted.toSeq
      assert(on.nonEmpty && on === off, "rewrite changed the answer")
      assert(off === spark.read.parquet(path)
        .select("l_returnflag", "l_linestatus", "n", "key_checksum", "sum_pscnt")
        .collect().map(_.toString).sorted.toSeq)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      // a PARTIAL key match joins at a different grain (fans out across
      // suppliers) — it must scan, never be served from the composite MV
      val partial = Tables.lineitem(spark, sf)
        .join(spark.read.parquet(bridge), col("l_partkey") === col("ps_partkey"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          sum("ps_cnt").as("sum_pscnt"))
      assert(!partial.queryExecution.executedPlan.toString
        .contains("graft-composite-summary"),
        "partial key match was wrongly served from the composite MV")
      // crossed pairing likewise
      val crossed = Tables.lineitem(spark, sf)
        .join(spark.read.parquet(bridge),
          col("l_partkey") === col("ps_suppkey") &&
            col("l_suppkey") === col("ps_partkey"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))
      assert(!crossed.queryExecution.executedPlan.toString
        .contains("graft-composite-summary"),
        "crossed key pairing was wrongly served from the composite MV")
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("stream-maintained join-MV serves only the committed snapshot version") {
    import graft.streaming.Streams
    val table = Streams.ensureSegmentStreamSummary(spark, sf)
    val feed = Streams.ensureOrdersFeed(spark, sf)
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def q = graft.streaming.Streams.queries("q261_stream_join_mv")(spark, sf)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft-seg-stream-snap"), plan.take(1500))
      assert(!plan.contains("customer.parquet") &&
        !plan.contains("graft-orders-feed"),
        "rewritten plan still scans a join side")
      val on = q.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = q.collect().map(_.toString).sorted.toSeq
      assert(off.nonEmpty && on === off)
      // the replay committed batch 2 and retained exactly v1 (the
      // predecessor); v1 = batches 0+1 = orders with o_orderkey % 3 in
      // (0, 1) joined and aggregated — batch i IS bucket i
      assert(Streams.committedVersion(table).contains(2L))
      val v1 = spark.read.parquet(table.resolve("v1").toString)
        .collect().map(_.toString).sorted.toSeq
      val expect01 = Tables.customer(spark, sf)
        .select("c_custkey", "c_mktsegment")
        .join(spark.read.parquet(feed)
            .where(pmod(col("o_orderkey"), lit(3)) =!= 2),
          col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"))
        .collect().map(_.toString).sorted.toSeq
      assert(v1 === expect01)
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("stream-maintained chain-MV: snapshot-only plan, AVG rides the pair, v1 time travel") {
    import graft.streaming.Streams
    val table = Streams.ensureChainStreamSummary(spark, sf)
    val feed = Streams.ensureLineitemFeed(spark, sf)
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def q = graft.streaming.Streams.queries("q266_stream_chain_mv")(spark, sf)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft-chain-stream-snap"), plan.take(1500))
      assert(!plan.contains("orders.parquet") &&
        !plan.contains("customer.parquet") && !plan.contains("graft-li-feed"),
        "rewritten plan still scans a chain side:\n" + plan.take(1500))
      val on = q.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = q.collect().map(_.toString).sorted.toSeq
      assert(off.nonEmpty && on === off)
      // the replay committed batch 2 and retained exactly v1 = batches
      // 0+1 = lineitem rows with l_orderkey % 3 in (0, 1) joined down
      // the chain and aggregated — batch i IS bucket i
      assert(Streams.committedVersion(table).contains(2L))
      val v1 = spark.read.parquet(table.resolve("v1").toString)
        .collect().map(_.toString).sorted.toSeq
      val expect01 = spark.read.parquet(feed)
        .where(pmod(col("l_orderkey"), lit(3)) =!= 2)
        .join(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(spark, sf).select("c_custkey", "c_mktsegment"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          sum("l_partkey").as("sum_part"), count(col("l_partkey")).as("cnt_part"))
        .collect().map(_.toString).sorted.toSeq
      assert(v1 === expect01)
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("stream-maintained snowflake-MV: snapshot-only plan, multi-column grain merge, v1 time travel") {
    import graft.streaming.Streams
    val table = Streams.ensureSnowflakeStreamSummary(spark, sf)
    val feed = Streams.ensureLineitemFeed(spark, sf)
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def q = graft.streaming.Streams.queries("q288_stream_snowflake_mv")(spark, sf)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft-snow-stream-snap"), plan.take(1500))
      assert(!plan.contains("orders.parquet") &&
        !plan.contains("part.parquet") && !plan.contains("graft-li-feed"),
        "rewritten plan still scans a snowflake side:\n" + plan.take(1500))
      val on = q.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = q.collect().map(_.toString).sorted.toSeq
      assert(off.nonEmpty && on === off)
      // the replay committed batch 2 and retained exactly v1 = batches
      // 0+1 joined through BOTH dims and aggregated on the 2-col grain
      assert(Streams.committedVersion(table).contains(2L))
      val v1 = spark.read.parquet(table.resolve("v1").toString)
        .collect().map(_.toString).sorted.toSeq
      val expect01 = spark.read.parquet(feed)
        .where(pmod(col("l_orderkey"), lit(3)) =!= 2)
        .join(Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority"),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.part(spark, sf).select("p_partkey", "p_type", "p_size"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("o_orderpriority", "p_type")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          sum("p_size").as("sum_size"))
        .collect().map(_.toString).sorted.toSeq
      assert(v1 === expect01)
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("stream-maintained composite-MV: snapshot-only plan closes the MV matrix, v1 time travel") {
    import graft.streaming.Streams
    val table = Streams.ensureCompositeStreamSummary(spark, sf)
    val feed = Streams.ensureCompositeFeed(spark, sf)
    val bridge = graft.ops.Scale.ensurePartsuppBridge(spark, sf)
    SummaryRewrite.install(spark)
    spark.conf.set(SummaryRewrite.EnabledKey, "true")
    try {
      def q = graft.streaming.Streams.queries("q289_stream_composite_mv")(spark, sf)
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("graft-comp-stream-snap"), plan.take(1500))
      assert(!plan.contains("graft-li-cfeed") && !plan.contains("graft-ps-bridge"),
        "rewritten plan still scans a composite side:\n" + plan.take(1500))
      val on = q.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = q.collect().map(_.toString).sorted.toSeq
      assert(off.nonEmpty && on === off)
      // the replay committed batch 2 and retained exactly v1 = batches
      // 0+1 probed through the bridge on BOTH keys
      assert(Streams.committedVersion(table).contains(2L))
      val v1 = spark.read.parquet(table.resolve("v1").toString)
        .collect().map(_.toString).sorted.toSeq
      val expect01 = spark.read.parquet(feed)
        .where(pmod(col("l_orderkey"), lit(3)) =!= 2)
        .join(spark.read.parquet(bridge),
          col("l_partkey") === col("ps_partkey") &&
            col("l_suppkey") === col("ps_suppkey"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          sum("ps_cnt").as("sum_pscnt"))
        .collect().map(_.toString).sorted.toSeq
      assert(v1 === expect01)
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }

  test("summary rebuilt at the same path invalidates the cached listing") {
    import SummaryRewrite._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(Tables.scratchDir), "graft-mvrebuild-")
    try {
      val srcPath = base.resolve("src").toString
      Seq((1L, 10L), (2L, 5L)).toDF("user_id", "cents")
        .repartition(1).write.parquet(srcPath)
      val sumPath = base.resolve("sum").toString
      Seq((1L, 111L), (2L, 222L)).toDF("user_id", "n_events")
        .repartition(1).write.parquet(sumPath)
      val key = graft.ops.Scale.sourcePathOf(spark.read.parquet(srcPath))
      register(key, Summary(SummaryLocation.FixedPath(sumPath), Seq("user_id"),
        Map(CountStar -> "n_events")))
      SummaryRewrite.install(spark)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      def agg = spark.read.parquet(srcPath).groupBy("user_id")
        .agg(count(lit(1)).as("n_events"))
      def rows = agg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rows === Map(1L -> 111L, 2L -> 222L)) // served + listing cached
      // scratch swept and REBUILT at the same path with different part
      // files (the mid-JVM re-materialization scenario): the rule must
      // re-list, not execute against the deleted pre-sweep files
      Tables.deleteRecursively(new java.io.File(sumPath))
      Seq((1L, 333L), (2L, 444L)).toDF("user_id", "n_events")
        .repartition(1).write.parquet(sumPath)
      // make the _SUCCESS stamp unambiguously newer than the first build
      assert(new java.io.File(sumPath, "_SUCCESS")
        .setLastModified(System.currentTimeMillis() + 5000))
      assert(rows === Map(1L -> 333L, 2L -> 444L),
        "cached pre-rebuild listing served after the summary was rebuilt")
      registry.remove(key): Unit
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      Tables.deleteRecursively(base.toFile)
    }
  }

  test("AVG requires the column's own non-null count, never COUNT(*)") {
    import SummaryRewrite._
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(Tables.scratchDir), "graft-mvavg-")
    try {
      // g=1 has x values (10, null): AVG(x) = 10.0, not 10/2
      val srcPath = base.resolve("src").toString
      Seq((1L, Some(10L)), (1L, None), (2L, Some(4L)))
        .toDF("g", "x").repartition(1).write.parquet(srcPath)
      val sumPath = base.resolve("sum").toString
      spark.read.parquet(srcPath).groupBy("g")
        .agg(count(lit(1)).as("n"), sum("x").as("sum_x"),
          count(col("x")).as("cnt_x"))
        .repartition(1).write.parquet(sumPath)
      val key = graft.ops.Scale.sourcePathOf(spark.read.parquet(srcPath))
      SummaryRewrite.install(spark)
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      def agg = spark.read.parquet(srcPath).groupBy("g")
        .agg(avg("x").as("avg_x"))
      // summary WITHOUT the per-column count: AVG must DECLINE (a
      // CountStar denominator would silently return 5.0 for g=1)
      register(key, Summary(SummaryLocation.FixedPath(sumPath), Seq("g"),
        Map(CountStar -> "n", SumCol("x") -> "sum_x")))
      assert(agg.queryExecution.executedPlan.toString.contains("src"),
        "AVG must not rewrite without COUNT(col)")
      // with CountCol registered: rewritten, and NULL-correct
      register(key, Summary(SummaryLocation.FixedPath(sumPath), Seq("g"),
        Map(CountStar -> "n", SumCol("x") -> "sum_x", CountCol("x") -> "cnt_x")))
      assert(!agg.queryExecution.executedPlan.toString.contains("src"))
      val got = agg.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got === Map(1L -> 10.0, 2L -> 4.0))
      registry.remove(key): Unit
    } finally {
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      Tables.deleteRecursively(base.toFile)
    }
  }

  test("non-qualifying shapes are left on the fact table") {
    enable()
    try {
      def factScan(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.executedPlan.toString.contains("lineitem.parquet")
      // a grouping column no registered grain contains (not even as a
      // roll-up source)
      assert(factScan(Tables.lineitem(spark, sf)
        .groupBy("l_suppkey").agg(count(lit(1)).as("n"))))
      // a filter between aggregate and scan changes the grain
      assert(factScan(Tables.lineitem(spark, sf)
        .where(col("l_quantity") > 10)
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))))
      // a measure no registered summary carries
      assert(factScan(Tables.lineitem(spark, sf)
        .groupBy("l_returnflag").agg(sum("l_suppkey").as("sp"))))
      // DISTINCT of a non-grain column disqualifies even at a carried
      // grouping
      assert(factScan(Tables.lineitem(spark, sf)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")).as("nd"))))
    } finally spark.conf.set(SummaryRewrite.EnabledKey, "false")
  }
}
