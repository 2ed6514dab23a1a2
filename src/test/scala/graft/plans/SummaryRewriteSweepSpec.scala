package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

/** Exhaustive soundness sweep for the broadened MV rewrite: every
  * combination of grouping (exact grain / strict subset / empty /
  * non-grain), measure set (carried, uncarried, AVG with and without
  * its COUNT(col) pair, distinct-of-grain, distinct-of-non-grain), and
  * filter (grain-column, non-grain, none) runs twice — rewrite ON and
  * OFF — and must return identical rows EITHER WAY. That is the
  * rewrite's one hard invariant: enabling it may change plans, never
  * answers. On top of the equality sweep, the expected qualify/decline
  * boundary is pinned per case, so a regression that silently stops
  * rewriting (performance loss) or rewrites a shape it must not
  * (soundness loss before the equality check would even fail) both
  * surface with the exact case label.
  *
  * The synthetic table deliberately includes NULLs in the measured
  * column (x) — the case that made AVG-over-COUNT(*) wrong — and a
  * column the summary does not carry (y).
  */
class SummaryRewriteSweepSpec extends SparkSpec {
  import SummaryRewrite._

  private lazy val base = {
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(Tables.scratchDir), "graft-mvsweep-")
    sys.addShutdownHook(Tables.deleteRecursively(dir.toFile))
    dir
  }

  private lazy val srcPath: String = {
    import spark.implicits._
    val p = base.resolve("src").toString
    // 3 g1 values × 4 g2 values, x null for ~1/5 rows, y uncarried
    val rows = for {
      i <- 0 until 240
      g1 = Seq("a", "b", "c")(i % 3)
      g2 = (i % 4).toLong
      x = if (i % 5 == 0) None else Some((i * 7 % 100).toLong)
      y = i * 0.5
    } yield (g1, g2, x, y)
    rows.toDF("g1", "g2", "x", "y").repartition(2).write.parquet(p)
    p
  }

  private lazy val registered: String = {
    val sumPath = base.resolve("sum").toString
    spark.read.parquet(srcPath).groupBy("g1", "g2")
      .agg(count(lit(1)).as("n"), count(col("x")).as("cnt_x"),
        sum("x").as("sum_x"), min("x").as("min_x"), max("x").as("max_x"))
      .repartition(1).write.parquet(sumPath)
    val key = graft.ops.Scale.sourcePathOf(spark.read.parquet(srcPath))
    register(key, Summary(SummaryLocation.FixedPath(sumPath), Seq("g1", "g2"),
      Map(CountStar -> "n", CountCol("x") -> "cnt_x", SumCol("x") -> "sum_x",
        MinCol("x") -> "min_x", MaxCol("x") -> "max_x")))
    SummaryRewrite.install(spark)
    key
  }

  test("every grouping × measure × filter combination: ON == OFF, boundary exact") {
    registered: Unit
    val df = () => spark.read.parquet(srcPath)

    // (label, grouping columns, qualifies-if-measures-do)
    val groupings: Seq[(String, Seq[String], Boolean)] = Seq(
      ("grain", Seq("g1", "g2"), true), // exact grain: direct mapping
      ("subset-g1", Seq("g1"), true), // roll-up
      ("subset-g2", Seq("g2"), true), // roll-up, other column
      ("global", Seq.empty, true), // global roll-up
      ("non-grain", Seq("y"), false)) // y is not a grain column

    // (label, measure exprs, measure-qualifies, direct-only)
    // direct-only measures qualify at the exact grain but not in
    // roll-up mode (none here — kept for shape)
    val measureSets: Seq[(String, Seq[org.apache.spark.sql.Column], Boolean)] = Seq(
      ("count*", Seq(count(lit(1)).as("m1")), true),
      ("countx", Seq(count(col("x")).as("m1")), true),
      ("sumx", Seq(sum("x").as("m1")), true),
      ("minmax", Seq(min("x").as("m1"), max("x").as("m2")), true),
      ("avgx", Seq(avg("x").as("m1")), true), // needs CountCol(x) — carried
      ("all", Seq(count(lit(1)).as("m1"), count(col("x")).as("m2"),
        sum("x").as("m3"), min("x").as("m4"), max("x").as("m5"),
        avg("x").as("m6")), true),
      ("sumy", Seq(sum("y").as("m1")), false), // uncarried column
      ("avgy", Seq(avg("y").as("m1")), false), // fractional AND uncarried
      ("mixed-bad", Seq(count(lit(1)).as("m1"), sum("y").as("m2")), false),
      ("nd-grain", Seq(countDistinct(col("g2")).as("m1")), false), // rollup-only...
      ("nd-non-grain", Seq(countDistinct(col("x")).as("m1")), false))

    // countDistinct(g2) qualifies ONLY in roll-up mode (in direct mode
    // the measure map has no entry for it) — handled per case below
    val filters: Seq[(String, Option[org.apache.spark.sql.Column], Boolean)] = Seq(
      ("nofilter", None, true),
      ("grainfilter", Some(col("g1") =!= "b"), true),
      ("nongrainfilter", Some(col("y") < 100), false))

    var checked = 0
    for {
      (gLabel, gCols, gOk) <- groupings
      (mLabel, mExprs, mOk) <- measureSets
      (fLabel, fCond, fOk) <- filters
    } {
      val label = s"$gLabel/$mLabel/$fLabel"
      def query: DataFrame = {
        val filtered = fCond.fold(df())(c => df().where(c))
        val grouped =
          if (gCols.isEmpty) filtered.agg(mExprs.head, mExprs.tail: _*)
          else filtered.groupBy(gCols.map(col): _*).agg(mExprs.head, mExprs.tail: _*)
        grouped
      }
      // countDistinct(g2) is answerable only by roll-up (strict subset
      // grain — either column — or global), never by the direct
      // exact-grain mapping
      val ndGrainOk = mLabel == "nd-grain" &&
        (gLabel == "subset-g1" || gLabel == "subset-g2" || gLabel == "global")
      val expectRewrite = gOk && (mOk || ndGrainOk) && fOk
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      val planOn = query.queryExecution.executedPlan.toString
      val on = query.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = query.collect().map(_.toString).sorted.toSeq
      assert(on === off, s"$label: rewrite changed the ANSWER")
      val rewrote = planOn.contains("graft-mvsweep") &&
        planOn.contains("/sum") && !planOn.contains("/src")
      assert(rewrote === expectRewrite,
        s"$label: expected rewrite=$expectRewrite, plan says $rewrote\n" +
          planOn.take(800))
      checked += 1
    }
    assert(checked === groupings.size * measureSets.size * filters.size)
    registry.remove(registered): Unit
  }

  // ---- join-MV sweep: the same ON==OFF + boundary treatment for the
  // two-table join registry (r10 swept only the single-table path) ----

  private lazy val joinSrcs: (String, String) = {
    import spark.implicits._
    val dimP = base.resolve("jdim").toString
    val factP = base.resolve("jfact").toString
    // 30 dim keys × (3 g1 values, 4 g2 values), dy uncarried
    (0 until 30).map(k =>
      (k.toLong, Seq("a", "b", "c")(k % 3), (k % 4).toLong, k * 0.5))
      .toDF("d_key", "g1", "g2", "dy").repartition(2).write.parquet(dimP)
    // 240 fact rows, x null for ~1/5, fy uncarried; every key resolves
    (0 until 240).map { i =>
      val x = if (i % 5 == 0) None else Some((i * 7 % 100).toLong)
      (i.toLong % 30, x, i * 0.25)
    }.toDF("f_key", "x", "fy").repartition(2).write.parquet(factP)
    (dimP, factP)
  }

  private lazy val joinRegistered: (String, String) = {
    val (dimP, factP) = joinSrcs
    val sumPath = base.resolve("jsum").toString
    spark.read.parquet(dimP)
      .join(spark.read.parquet(factP), col("d_key") === col("f_key"))
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("n"), count(col("x")).as("cnt_x"),
        sum("x").as("sum_x"), min("x").as("min_x"), max("x").as("max_x"))
      .repartition(1).write.parquet(sumPath)
    val dimKey = graft.ops.Scale.sourcePathOf(spark.read.parquet(dimP))
    val factKey = graft.ops.Scale.sourcePathOf(spark.read.parquet(factP))
    registerJoin(dimKey, factKey, JoinSummary("d_key", "f_key",
      SummaryLocation.FixedPath(sumPath), Seq("g1", "g2"),
      Map(CountStar -> "n", CountCol("x") -> "cnt_x", SumCol("x") -> "sum_x",
        MinCol("x") -> "min_x", MaxCol("x") -> "max_x")))
    SummaryRewrite.install(spark)
    (dimKey, factKey)
  }

  test("join-MV: every grouping × measure × filter × key: ON == OFF, boundary exact") {
    joinRegistered: Unit
    val (dimP, factP) = joinSrcs
    val dim = () => spark.read.parquet(dimP)
    val fact = () => spark.read.parquet(factP)

    val groupings: Seq[(String, Seq[String], Boolean)] = Seq(
      ("grain", Seq("g1", "g2"), true),
      ("subset-g1", Seq("g1"), true),
      ("global", Seq.empty, true),
      ("non-grain", Seq("dy"), false))

    val measureSets: Seq[(String, Seq[org.apache.spark.sql.Column], Boolean)] = Seq(
      ("count*", Seq(count(lit(1)).as("m1")), true),
      ("countx", Seq(count(col("x")).as("m1")), true),
      ("sumx", Seq(sum("x").as("m1")), true),
      ("minmax", Seq(min("x").as("m1"), max("x").as("m2")), true),
      ("avgx", Seq(avg("x").as("m1")), true),
      ("all", Seq(count(lit(1)).as("m1"), count(col("x")).as("m2"),
        sum("x").as("m3"), min("x").as("m4"), max("x").as("m5"),
        avg("x").as("m6")), true),
      ("sum-fy", Seq(sum("fy").as("m1")), false), // uncarried fact col
      ("sum-dy", Seq(sum("dy").as("m1")), false), // uncarried dim col
      ("nd-grain", Seq(countDistinct(col("g2")).as("m1")), false),
      ("nd-non-grain", Seq(countDistinct(col("x")).as("m1")), false))

    // (label, dim-side filter, fact-side filter, qualifies)
    val filters: Seq[(String, Option[org.apache.spark.sql.Column],
        Option[org.apache.spark.sql.Column], Boolean)] = Seq(
      ("nofilter", None, None, true),
      ("dim-grainfilter", Some(col("g1") =!= "b"), None, true),
      ("dim-nongrainfilter", Some(col("dy") < 100), None, false),
      ("fact-filter", None, Some(col("x") > 5), false)) // x not grain

    // (label, join condition builder, qualifies) — the wrong key chain
    // must decline even for otherwise-qualifying cases
    val keys: Seq[(String, org.apache.spark.sql.Column, Boolean)] = Seq(
      ("rightkey", col("d_key") === col("f_key"), true),
      ("flippedkey", col("f_key") === col("d_key"), true), // EqualTo commutes
      ("wrongkey", col("g2") === col("f_key"), false))

    var checked = 0
    for {
      (gLabel, gCols, gOk) <- groupings
      (mLabel, mExprs, mOk) <- measureSets
      (fLabel, dimCond, factCond, fOk) <- filters
      (kLabel, kCond, kOk) <- keys
    } {
      val label = s"$gLabel/$mLabel/$fLabel/$kLabel"
      def query: DataFrame = {
        val d0 = dimCond.fold(dim())(c => dim().where(c))
        val f0 = factCond.fold(fact())(c => fact().where(c))
        val joined = d0.join(f0, kCond)
        if (gCols.isEmpty) joined.agg(mExprs.head, mExprs.tail: _*)
        else joined.groupBy(gCols.map(col): _*).agg(mExprs.head, mExprs.tail: _*)
      }
      val ndGrainOk = mLabel == "nd-grain" &&
        (gLabel == "subset-g1" || gLabel == "global")
      val expectRewrite = gOk && (mOk || ndGrainOk) && fOk && kOk
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      val planOn = query.queryExecution.executedPlan.toString
      val on = query.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = query.collect().map(_.toString).sorted.toSeq
      assert(on === off, s"$label: rewrite changed the ANSWER")
      val rewrote = planOn.contains("/jsum") &&
        !planOn.contains("/jdim") && !planOn.contains("/jfact")
      assert(rewrote === expectRewrite,
        s"$label: expected rewrite=$expectRewrite, plan says $rewrote\n" +
          planOn.take(800))
      checked += 1
    }
    assert(checked ===
      groupings.size * measureSets.size * filters.size * keys.size)
    joinRegistry.remove(joinRegistered): Unit
  }

  // ---- chain-MV sweep: the same treatment for the 3-table chain path
  // (dim ⋈ mid ⋈ fact down a two-hop key chain) ----

  private lazy val chainSrcs: (String, String, String) = {
    import spark.implicits._
    val dimP = base.resolve("cdim").toString
    val midP = base.resolve("cmid").toString
    val factP = base.resolve("cfact").toString
    (0 until 30).map(k =>
      (k.toLong, Seq("a", "b", "c")(k % 3), (k % 4).toLong, k * 0.5))
      .toDF("d_key", "g1", "g2", "dy").repartition(2).write.parquet(dimP)
    // the bridge: d_key k ↔ f_key k + 100
    (0 until 30).map(k => (k.toLong, k.toLong + 100))
      .toDF("m_left", "m_right").repartition(2).write.parquet(midP)
    (0 until 240).map { i =>
      val x = if (i % 5 == 0) None else Some((i * 7 % 100).toLong)
      (i.toLong % 30 + 100, x, i * 0.25)
    }.toDF("f_key", "x", "fy").repartition(2).write.parquet(factP)
    (dimP, midP, factP)
  }

  private lazy val chainRegistered: Seq[String] = {
    val (dimP, midP, factP) = chainSrcs
    val sumPath = base.resolve("csum").toString
    spark.read.parquet(dimP)
      .join(spark.read.parquet(midP), col("d_key") === col("m_left"))
      .join(spark.read.parquet(factP), col("m_right") === col("f_key"))
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("n"), count(col("x")).as("cnt_x"),
        sum("x").as("sum_x"), min("x").as("min_x"), max("x").as("max_x"))
      .repartition(1).write.parquet(sumPath)
    val srcs = Seq(dimP, midP, factP)
      .map(p => graft.ops.Scale.sourcePathOf(spark.read.parquet(p)))
    registerChain(srcs, ChainSummary(
      Seq(("d_key", "m_left"), ("m_right", "f_key")),
      SummaryLocation.FixedPath(sumPath), Seq("g1", "g2"),
      Map(CountStar -> "n", CountCol("x") -> "cnt_x", SumCol("x") -> "sum_x",
        MinCol("x") -> "min_x", MaxCol("x") -> "max_x")))
    SummaryRewrite.install(spark)
    srcs
  }

  test("chain-MV: every grouping × measure × filter × key: ON == OFF, boundary exact") {
    chainRegistered: Unit
    val (dimP, midP, factP) = chainSrcs
    val dim = () => spark.read.parquet(dimP)
    val mid = () => spark.read.parquet(midP)
    val fact = () => spark.read.parquet(factP)

    val groupings: Seq[(String, Seq[String], Boolean)] = Seq(
      ("grain", Seq("g1", "g2"), true),
      ("subset-g1", Seq("g1"), true),
      ("global", Seq.empty, true),
      ("non-grain", Seq("dy"), false))

    val measureSets: Seq[(String, Seq[org.apache.spark.sql.Column], Boolean)] = Seq(
      ("count*", Seq(count(lit(1)).as("m1")), true),
      ("countx", Seq(count(col("x")).as("m1")), true),
      ("sumx", Seq(sum("x").as("m1")), true),
      ("minmax", Seq(min("x").as("m1"), max("x").as("m2")), true),
      ("avgx", Seq(avg("x").as("m1")), true),
      ("sum-fy", Seq(sum("fy").as("m1")), false),
      ("nd-grain", Seq(countDistinct(col("g2")).as("m1")), false),
      ("nd-non-grain", Seq(countDistinct(col("x")).as("m1")), false))

    val filters: Seq[(String, Option[org.apache.spark.sql.Column], Boolean)] = Seq(
      ("nofilter", None, true),
      ("dim-grainfilter", Some(col("g1") =!= "b"), true),
      ("dim-nongrainfilter", Some(col("dy") < 100), false))

    // the second hop's key swapped for a non-registered column must
    // decline even for otherwise-qualifying cases
    val keys: Seq[(String, (org.apache.spark.sql.Column, org.apache.spark.sql.Column), Boolean)] = Seq(
      ("rightchain", (col("d_key") === col("m_left"),
        col("m_right") === col("f_key")), true),
      ("wrongkey2", (col("d_key") === col("m_left"),
        col("m_left") === col("f_key")), false))

    var checked = 0
    for {
      (gLabel, gCols, gOk) <- groupings
      (mLabel, mExprs, mOk) <- measureSets
      (fLabel, dimCond, fOk) <- filters
      (kLabel, (k1, k2), kOk) <- keys
    } {
      val label = s"$gLabel/$mLabel/$fLabel/$kLabel"
      def query: DataFrame = {
        val d0 = dimCond.fold(dim())(c => dim().where(c))
        val joined = d0.join(mid(), k1).join(fact(), k2)
        if (gCols.isEmpty) joined.agg(mExprs.head, mExprs.tail: _*)
        else joined.groupBy(gCols.map(col): _*).agg(mExprs.head, mExprs.tail: _*)
      }
      val ndGrainOk = mLabel == "nd-grain" &&
        (gLabel == "subset-g1" || gLabel == "global")
      val expectRewrite = gOk && (mOk || ndGrainOk) && fOk && kOk
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      val planOn = query.queryExecution.executedPlan.toString
      val on = query.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = query.collect().map(_.toString).sorted.toSeq
      assert(on === off, s"$label: rewrite changed the ANSWER")
      val rewrote = planOn.contains("/csum") && !planOn.contains("/cdim") &&
        !planOn.contains("/cmid") && !planOn.contains("/cfact")
      assert(rewrote === expectRewrite,
        s"$label: expected rewrite=$expectRewrite, plan says $rewrote\n" +
          planOn.take(800))
      checked += 1
    }
    assert(checked ===
      groupings.size * measureSets.size * filters.size * keys.size)
    chainRegistry.remove(chainRegistered): Unit
  }

  // ---- composite-key join-MV sweep: two-column equi key, where the
  // KEY axis is the point — partial, crossed, reordered, and padded
  // conjunct sets must each land on the right side of the decline ----

  private lazy val compositeSrcs: (String, String) = {
    import spark.implicits._
    val dimP = base.resolve("cjdim").toString
    val factP = base.resolve("cjfact").toString
    // (k % 6, k % 5) is a CRT bijection over 30 dim rows, so the
    // composite key matches exactly one dim row per fact row while each
    // SINGLE column alone fans out 5-or-6-ways — a partial-key match is
    // a genuinely different (wrong) grain, not an equivalent plan
    (0 until 30).map(k =>
      (k.toLong % 6, k.toLong % 5, Seq("a", "b", "c")(k % 3),
        (k % 4).toLong, k * 0.5))
      .toDF("d_k1", "d_k2", "g1", "g2", "dy").repartition(2).write.parquet(dimP)
    (0 until 240).map { i =>
      val x = if (i % 5 == 0) None else Some((i * 7 % 100).toLong)
      (i.toLong % 6, i.toLong % 5, x, i * 0.25)
    }.toDF("f_k1", "f_k2", "x", "fy").repartition(2).write.parquet(factP)
    (dimP, factP)
  }

  private lazy val compositeRegistered: (String, String) = {
    val (dimP, factP) = compositeSrcs
    val sumPath = base.resolve("cjsum").toString
    spark.read.parquet(dimP)
      .join(spark.read.parquet(factP),
        col("d_k1") === col("f_k1") && col("d_k2") === col("f_k2"))
      .groupBy("g1", "g2")
      .agg(count(lit(1)).as("n"), count(col("x")).as("cnt_x"),
        sum("x").as("sum_x"), min("x").as("min_x"), max("x").as("max_x"))
      .repartition(1).write.parquet(sumPath)
    val dimKey = graft.ops.Scale.sourcePathOf(spark.read.parquet(dimP))
    val factKey = graft.ops.Scale.sourcePathOf(spark.read.parquet(factP))
    registerCompositeJoin(dimKey, factKey, CompositeJoinSummary(
      Seq(("d_k1", "f_k1"), ("d_k2", "f_k2")),
      SummaryLocation.FixedPath(sumPath), Seq("g1", "g2"),
      Map(CountStar -> "n", CountCol("x") -> "cnt_x", SumCol("x") -> "sum_x",
        MinCol("x") -> "min_x", MaxCol("x") -> "max_x")))
    SummaryRewrite.install(spark)
    (dimKey, factKey)
  }

  test("composite-key join-MV: grouping × measure × filter × key variants: ON == OFF, boundary exact") {
    compositeRegistered: Unit
    val (dimP, factP) = compositeSrcs
    val dim = () => spark.read.parquet(dimP)
    val fact = () => spark.read.parquet(factP)

    val groupings: Seq[(String, Seq[String], Boolean)] = Seq(
      ("grain", Seq("g1", "g2"), true),
      ("subset-g1", Seq("g1"), true),
      ("non-grain", Seq("dy"), false))

    val measureSets: Seq[(String, Seq[org.apache.spark.sql.Column], Boolean)] = Seq(
      ("count*", Seq(count(lit(1)).as("m1")), true),
      ("sumx", Seq(sum("x").as("m1")), true),
      ("minmax", Seq(min("x").as("m1"), max("x").as("m2")), true),
      ("avgx", Seq(avg("x").as("m1")), true),
      ("all", Seq(count(lit(1)).as("m1"), count(col("x")).as("m2"),
        sum("x").as("m3"), min("x").as("m4"), max("x").as("m5"),
        avg("x").as("m6")), true),
      ("sum-fy", Seq(sum("fy").as("m1")), false),
      ("nd-non-grain", Seq(countDistinct(col("x")).as("m1")), false))

    val filters: Seq[(String, Option[org.apache.spark.sql.Column], Boolean)] = Seq(
      ("nofilter", None, true),
      ("dim-grainfilter", Some(col("g1") =!= "b"), true),
      ("dim-nongrainfilter", Some(col("dy") < 100), false))

    // THE composite axis: only the exact pair set qualifies, in any
    // conjunct order and either EqualTo orientation; anything partial,
    // crossed, or padded is a different join grain and must decline
    val keys: Seq[(String, org.apache.spark.sql.Column, Boolean)] = Seq(
      ("bothkeys", col("d_k1") === col("f_k1") && col("d_k2") === col("f_k2"), true),
      ("reordered", col("d_k2") === col("f_k2") && col("d_k1") === col("f_k1"), true),
      ("flipped", col("f_k1") === col("d_k1") && col("f_k2") === col("d_k2"), true),
      ("partial-k1", col("d_k1") === col("f_k1"), false),
      ("partial-k2", col("d_k2") === col("f_k2"), false),
      ("crossed", col("d_k1") === col("f_k2") && col("d_k2") === col("f_k1"), false),
      ("extra-eq", col("d_k1") === col("f_k1") && col("d_k2") === col("f_k2")
        && col("g2") === col("x"), false))

    var checked = 0
    for {
      (gLabel, gCols, gOk) <- groupings
      (mLabel, mExprs, mOk) <- measureSets
      (fLabel, dimCond, fOk) <- filters
      (kLabel, kCond, kOk) <- keys
    } {
      val label = s"$gLabel/$mLabel/$fLabel/$kLabel"
      def query: DataFrame = {
        val d0 = dimCond.fold(dim())(c => dim().where(c))
        val joined = d0.join(fact(), kCond)
        if (gCols.isEmpty) joined.agg(mExprs.head, mExprs.tail: _*)
        else joined.groupBy(gCols.map(col): _*).agg(mExprs.head, mExprs.tail: _*)
      }
      val expectRewrite = gOk && mOk && fOk && kOk
      spark.conf.set(SummaryRewrite.EnabledKey, "true")
      val planOn = query.queryExecution.executedPlan.toString
      val on = query.collect().map(_.toString).sorted.toSeq
      spark.conf.set(SummaryRewrite.EnabledKey, "false")
      val off = query.collect().map(_.toString).sorted.toSeq
      assert(on === off, s"$label: rewrite changed the ANSWER")
      val rewrote = planOn.contains("/cjsum") &&
        !planOn.contains("/cjdim") && !planOn.contains("/cjfact")
      assert(rewrote === expectRewrite,
        s"$label: expected rewrite=$expectRewrite, plan says $rewrote\n" +
          planOn.take(800))
      checked += 1
    }
    assert(checked ===
      groupings.size * measureSets.size * filters.size * keys.size)
    compositeJoinRegistry.remove(compositeRegistered): Unit
  }
}
