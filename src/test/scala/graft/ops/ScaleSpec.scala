package graft.ops

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ScaleSpec extends SparkSpec {

  test("fanOut widens a single-file scan to cluster width and preserves rows") {
    val li = Tables.lineitem(spark, sf)
    val fanned = Tables.fanOut(li, col("l_orderkey"))
    // the test corpora are single-file sources — fanOut must engage
    assert(fanned.queryExecution.executedPlan.toString.contains("Exchange"))
    assert(fanned.rdd.getNumPartitions === spark.sparkContext.defaultParallelism)
    // pure repartition: same multiset of rows
    assert(fanned.count() === li.count())
    val a = fanned.groupBy("l_returnflag").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val b = li.groupBy("l_returnflag").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(a === b)
  }

  test("fanOut is a no-op when the source already fills the cluster") {
    // a many-file source stands in for the production layout: write the
    // nation table as more files than defaultParallelism
    val path = s"${Tables.scratchDir}/fanout-many-files"
    Tables.nation(spark, sf).repartition(spark.sparkContext.defaultParallelism + 1)
      .write.mode("overwrite").parquet(path)
    val many = spark.read.parquet(path)
    assert(Tables.fanOut(many, col("n_nationkey")) eq many)
  }

  test("AQE splits the skewed partition of a shuffle join at runtime") {
    import spark.implicits._
    // one hot key carrying ~99% of the rows, forced through a shuffle
    // join (broadcast disabled) with thresholds scaled down to test size
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8k",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(200000)
        .select((when(col("id") % 100 === 0, col("id") % 1000).otherwise(lit(0L)))
          .as("k"), col("id").as("payload"))
      val right = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("dim"))
      // global aggregate: a groupBy on the join key would let AQE veto
      // the skew split (it would break the partitioning the aggregate
      // needs); a distribution-free consumer keeps the split legal
      // sum(payload) keeps the (poorly-compressing) payload column in
      // the shuffle so the hot partition's bytes clear the threshold
      val joined = left.join(right, "k")
        .agg(sum(col("payload") * col("payload")).as("n"))
      joined.collect() // materialize so AQE finalizes the plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"), plan)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted aggregation equals the direct groupBy") {
    val li = Tables.lineitem(spark, sf)
    val salted = Scale.saltedSum(li, col("l_returnflag"), col("l_quantity"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total"),
        count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(salted === direct)
  }

  test("salted plan spreads the hot key over salt sub-groups") {
    // a maximally skewed input: one key only
    val skewed = spark.range(10000).select(lit("hot").as("k"), col("id").cast("double").as("v"))
    val out = Scale.saltedSum(skewed, col("k"), col("v")).collect()
    assert(out.length === 1)
    assert(out.head.getDouble(1) === (0 until 10000).map(_.toDouble).sum)
    assert(out.head.getLong(2) === 10000L)
  }

  test("partitioned scan prunes to the selected partition") {
    val df = Scale.partitionPrunedScan(spark, sf)
    val result = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(o_year"),
      s"expected partition filters in scan:\n$plan")
    val direct = Tables.orders(spark, sf)
      .where(org.apache.spark.sql.functions.year(col("o_orderdate")) === 1997)
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(result === direct)
  }

  test("bucketed join runs without a shuffle exchange") {
    // the tables are tiny, so Spark would broadcast and never exercise
    // the bucketed layout; disable broadcast to see the 100 TB plan shape
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try bucketedJoinBody()
    finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("runtime bloom filter prunes the probe side of a selective join") {
    // Spark's InjectRuntimeFilter: a selective filter on the build side
    // becomes a bloom-filter semi-join reduction on the probe side — at
    // 100 TB this skips most of the big table's rows before the shuffle.
    // The default thresholds (10 GB probe-side scan) are sized for real
    // clusters; lower them to see the 100 TB plan shape on test data,
    // and disable broadcast so the join actually shuffles.
    val prevB = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    try {
      val sel = Tables.orders(spark, sf).where(col("o_totalprice") > 400000)
        .select("o_orderkey", "o_totalprice")
      val joined = Tables.lineitem(spark, sf)
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_items"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"no bloom-filter runtime filter on the probe side:\n$plan")
      // the reduction is a filter, never a row change
      val expect = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf).where(col("o_totalprice") > 400000),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderkey").agg(count(lit(1)).as("n_items"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got === expect && got.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevB)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.optimizer.runtime.bloomFilter.enabled")
      spark.conf.unset(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
    }
  }

  private def bucketedJoinBody(): Unit = {
    val joined = Scale.bucketedJoin(spark, sf)
    val bucketed = joined.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // inspect the AQE-final plan: a sort-merge join directly over the two
    // bucketed scans, with NO exchange on either join key (the aggregate
    // above it may still exchange on its own key)
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled-family join over bucketed scans:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning(o_custkey") &&
      !plan.contains("Exchange hashpartitioning(c_custkey"),
      s"join inputs must be exchange-free (bucketing co-locates):\n$plan")
    assert(plan.contains("Bucketed: true"), s"scans must use the bucket layout:\n$plan")
    // and the result matches the plain join
    val direct = Tables.customer(spark, sf)
      .join(Tables.orders(spark, sf),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_orders"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(bucketed === direct)
  }

  test("Z-order ranges bound BOTH dimensions far tighter than a 1-D sort") {
    val rows = Scale.zorderBuckets(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length > 100) // 256 ranges, some possibly empty
    val (pkLo, pkHi) = (rows.map(_._3).min, rows.map(_._4).max)
    val (skLo, skHi) = (rows.map(_._5).min, rows.map(_._6).max)
    val (pkDom, skDom) = (pkHi - pkLo + 1, skHi - skLo + 1)
    // weight per-range spans by row count: the mean file a box query
    // probes must bound both dims well under the full domain (a 1-D
    // pk-sort leaves every file's sk span at ~the full sk domain)
    val n = rows.map(_._2).sum.toDouble
    val meanPkSpan = rows.map(r => r._2 * (r._4 - r._3 + 1).toDouble).sum / n
    val meanSkSpan = rows.map(r => r._2 * (r._6 - r._5 + 1).toDouble).sum / n
    assert(meanPkSpan < pkDom / 8.0,
      s"pk span $meanPkSpan vs domain $pkDom — no pk locality")
    assert(meanSkSpan < skDom / 8.0,
      s"sk span $meanSkSpan vs domain $skDom — no sk locality")
  }

  test("salted join equals the plain join and matches every fact row once") {
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val saltedDf = Scale.saltedJoin(spark, sf)
    // the demo only demonstrates anything in the SHUFFLED join regime —
    // a broadcast join has no shuffle skew to spread. Collect the node
    // structurally (plan-string formats drift; ADVICE r6).
    val shuffledJoins = saltedDf.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(shuffledJoins.nonEmpty, saltedDf.queryExecution.sparkPlan.toString)
    val salted = saltedDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted.nonEmpty && salted === plain)
    // replication is exact: the salted plan neither drops nor double-
    // counts fact rows (each fact row meets its dim row at exactly one
    // salt value)
    val factRows = Tables.lineitem(spark, sf).count()
    assert(salted.toSeq.map(_._2).sum === factRows)
  }

  test("stats-chosen join: uniform stats pick plain, hot-key stats pick salted, results equal") {
    import org.apache.spark.sql.functions._
    // the REGISTERED q274 runs on the real corpus, whose measured max
    // l_orderkey frequency (the 7-line order cap) is far under 16× the
    // mean — the plain branch must serve, with no salt machinery
    val served = Scale.statsAdaptiveJoin(spark, sf)
    val servedPlan = served.queryExecution.executedPlan.toString
    assert(!servedPlan.contains("_salt"),
      "salting fired on a uniform corpus:\n" + servedPlan.take(2000))
    // constructed fixtures drive BOTH branches through the same chooser
    val tmp = java.nio.file.Files.createTempDirectory("statsjoin").toString
    def mkFixture(hot: Boolean): (String, org.apache.spark.sql.DataFrame,
        org.apache.spark.sql.DataFrame) = {
      val name = if (hot) "hot" else "uniform"
      val n = 2000
      val key = if (hot) when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id"))
        else col("id") % 100
      val fact = spark.range(n).select(key.as("fk"), col("id").as("payload"))
      val dim = spark.range(100).select(col("id").as("dk"),
        concat(lit("g"), (col("id") % 5).cast("string")).as("grp"))
      fact.write.mode("overwrite").parquet(s"$tmp/$name-fact")
      Scale.writeKeyStats(spark.read.parquet(s"$tmp/$name-fact"), "fk",
        s"$tmp/$name-stats")
      (s"$tmp/$name-stats", spark.read.parquet(s"$tmp/$name-fact"), dim)
    }
    def run(hot: Boolean) = {
      val (stats, fact, dim) = mkFixture(hot)
      // payload is unique per row: the discriminator that spreads a hot
      // key's rows across salts even when the key column itself cannot
      val df = Scale.statsChosenEquiJoin(spark, stats, fact, "fk",
        Seq("payload"), dim, "dk")
        .groupBy("grp").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      val plan = df.queryExecution.executedPlan.toString
      val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val want = fact.join(dim, col("fk") === col("dk"))
        .groupBy("grp").agg(count(lit(1)).as("n"), sum("payload").as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want && got.nonEmpty, s"hot=$hot diverged from the plain join")
      plan
    }
    // ~90% of rows on key 1 → max/mean ratio ≫ 16 → salted branch
    val hotPlan = run(hot = true)
    assert(hotPlan.contains("_salt"),
      "hot-key stats did not fire the salted branch:\n" + hotPlan.take(2000))
    // 100 uniform keys → ratio 1 → plain branch
    val uniformPlan = run(hot = false)
    assert(!uniformPlan.contains("_salt"),
      "uniform stats fired the salted branch:\n" + uniformPlan.take(2000))
  }

  test("stats-chosen broadcast: measured small dim broadcasts, inflated dim shuffles, results equal") {
    import org.apache.spark.sql.functions._
    // the REGISTERED q285 runs on the real corpus: 25 measured nation
    // rows sit far under the 10 MB budget → the broadcast branch serves
    val served = Scale.statsBroadcastJoin(spark, sf)
    val bcastJoins = served.queryExecution.sparkPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }
    assert(bcastJoins.nonEmpty,
      "measured small dim did not broadcast:\n" +
        served.queryExecution.sparkPlan.toString.take(2000))
    // fixtures drive BOTH branches through the same chooser: the same
    // dim with its measured stats, once under the real budget (broadcast)
    // and once under a 1-byte budget (the inflated-dim regime: measured
    // bytes exceed what the executors can replicate → shuffled merge)
    val tmp = java.nio.file.Files.createTempDirectory("statsbcast").toString
    val fact = spark.range(2000).select((col("id") % 100).as("fk"),
      col("id").as("payload"))
    val dim = spark.range(100).select(col("id").as("dk"),
      concat(lit("g"), (col("id") % 5).cast("string")).as("grp"))
    Scale.writeDimStats(dim, s"$tmp/stats")
    def run(budget: Long) = {
      val df = Scale.statsChosenBroadcastJoin(spark, s"$tmp/stats",
        fact, "fk", dim, "dk", budgetBytes = budget)
        .groupBy("grp").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      val got = df.collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      (df.queryExecution.sparkPlan, got)
    }
    val (bigBudgetPlan, viaBcast) = run(budget = 10L << 20)
    assert(bigBudgetPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.nonEmpty, bigBudgetPlan.toString.take(2000))
    val (tinyBudgetPlan, viaShuffle) = run(budget = 1L)
    assert(tinyBudgetPlan.collect {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }.nonEmpty, "over-budget dim did not pick the shuffled merge:\n" +
      tinyBudgetPlan.toString.take(2000))
    assert(tinyBudgetPlan.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
    }.isEmpty, "over-budget dim still broadcast")
    // both branches compute the identical relation
    val want = fact.join(dim, col("fk") === col("dk"))
      .groupBy("grp").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaBcast === want && viaShuffle === want && want.nonEmpty)
    // overlapping schemas are rejected up front (the ambiguous-select guard)
    val err = intercept[IllegalArgumentException] {
      Scale.statsChosenBroadcastJoin(spark, s"$tmp/stats",
        fact.withColumnRenamed("payload", "grp"), "fk", dim, "dk")
    }
    assert(err.getMessage.contains("disjoint"))
  }

  test("bloom join probes the filter at the fact scan and equals the plain join") {
    val df = Scale.bloomJoin(spark, sf)
    // the probe must sit on the lineitem (fact) side of the plan, i.e.
    // the bloom prunes BEFORE the join — not after it
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(plan.contains("bloom_filter_agg"), plan)
    val got = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).where(col("o_totalprice") > 494000),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("total_qty"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got.nonEmpty && got === plain)
  }

  test("compaction plan equals a driver-side greedy offset binning") {
    val target = 2048L
    val got = Scale.compactionPlan(spark, sf, target).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val docs = Tables.documents(spark, sf)
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = docs.groupBy(_._1).flatMap { case (src, rows) =>
      var off = 0L
      rows.sortBy(_._2).map { case (_, id, n) =>
        val bin = off / target; off += n; (src, bin, id, n)
      }.groupBy { case (_, bin, _, _) => bin }.map { case (bin, grp) =>
        (src, bin) -> (grp.length.toLong, grp.map(_._4).sum,
          grp.map(_._3).min, grp.map(_._3).max)
      }
    }
    assert(got === want)
    // bins cover contiguous, non-overlapping doc_id ranges per source
    got.toSeq.groupBy(_._1._1).foreach { case (_, bins) =>
      bins.sortBy(_._1._2).sliding(2).foreach {
        case Seq((_, (_, _, _, lastA)), (_, (_, _, firstB, _))) =>
          assert(lastA < firstB)
        case _ =>
      }
    }
  }

  test("zone-map audit: all three classes live, partition exact, replayable") {
    val got = Scale.zoneMapAudit(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet === Set("skip", "full", "partial"),
      s"predicate must produce all three zone classes: $got")
    val ev = Tables.events(spark, sf)
      .selectExpr("unix_micros(ts) as t").collect().map(_.getLong(0))
    val lo = java.time.Instant.parse("2024-01-10T12:00:00Z").toEpochMilli * 1000L
    val hi = java.time.Instant.parse("2024-01-20T06:00:00Z").toEpochMilli * 1000L
    val want = ev.groupBy(_ / 86400000000L).values.map { zs =>
      val (zmin, zmax) = (zs.min, zs.max)
      val cls =
        if (zmax < lo || zmin >= hi) "skip"
        else if (zmin >= lo && zmax < hi) "full"
        else "partial"
      (cls, zs.size.toLong)
    }.groupBy(_._1).map { case (c, xs) => (c, (xs.size.toLong, xs.map(_._2).sum)) }
    assert(got === want.toMap)
  }
}
