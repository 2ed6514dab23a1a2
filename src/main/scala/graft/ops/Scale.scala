package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Scale utilities: the techniques a 100 TB deployment leans on when the
  * default shuffle behavior is not enough.
  */
object Scale {

  /** Two-phase salted aggregation for skewed group keys: rows of one hot
    * key are first spread over `salts` sub-groups (partial aggregate),
    * then the per-salt partials are combined (final aggregate). For
    * algebraic aggregates (sum/count) the result is identical to the
    * direct groupBy; the hot key's work is spread over `salts` tasks
    * instead of one straggler.
    *
    * The salt comes from a hash of the whole row's physical position
    * (`monotonically_increasing_id`), so no extra column is required and
    * the distribution is uniform regardless of key skew.
    */
  def saltedSum(df: DataFrame, key: Column, value: Column, salts: Int = 16): DataFrame = {
    val partial = df
      .select(key.as("k"), value.as("v"),
        pmod(xxhash64(monotonically_increasing_id()), lit(salts)).as("_salt"))
      .groupBy(col("k"), col("_salt"))
      .agg(sum(col("v").cast("decimal(18,2)")).as("pv"), count(lit(1)).as("pc"))
    partial
      .groupBy(col("k"))
      .agg(sum(col("pv")).cast("double").as("total"), sum(col("pc")).as("cnt"))
  }

  /** Write a date-partitioned copy of orders (partitionBy year) and query
    * one year: the scan must touch only that year's directory —
    * `PartitionFilters` in the plan, the pruning that turns a 100 TB
    * table into the slice a query actually reads.
    */
  def partitionPrunedScan(s: SparkSession, d: String): DataFrame = {
    s.read.parquet(ensurePartitionedOrders(s, d))
      .where(col("o_year") === 1997)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
  }

  /** One-time, idempotent write of the date-partitioned orders copy;
    * returns its path. Keyed by the source dataset's content fingerprint
    * (`Tables.datasetTag`) so different datasets/sfs never serve each
    * other's data AND a corpus regeneration at the same path
    * invalidates the copy. Split out of the query body so a
    * benchmark can warm it up and measure only the pruned scan.
    */
  private val dpoLock = new Object

  def ensurePartitionedOrders(s: SparkSession, d: String): String = dpoLock.synchronized {
    val path = s"${Tables.scratchDir}/graft-orders-by-year-${Tables.datasetTag(d, "orders")}"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")))
        // fixed per-partition layout regardless of which JVM builds it
        // (the edge-list lesson)
        .repartition(8, col("o_orderkey"))
        .write.mode("overwrite").partitionBy("o_year").parquet(path)
    }
    path
  }


  /** Register bucketed copies of two tables and return the co-located
    * join: both sides pre-partitioned into the same bucket layout on the
    * join key, so the join itself needs NO shuffle (no Exchange in the
    * plan) — the pattern for repeatedly-joined 100 TB fact tables.
    * Buckets are written once per dataset and reused (table names embed
    * the dataset content fingerprint, so sfs never collide and corpus
    * regeneration invalidates).
    */
  def bucketedJoin(s: SparkSession, d: String, buckets: Int = 8): DataFrame = {
    val suffix = ensureBucketedTables(s, d, buckets)
    val o = s.table(s"orders_bkt_$suffix")
    val c = s.table(s"customer_bkt_$suffix")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"))
  }

  /** One-time, idempotent registration of the bucketed table copies;
    * returns the per-dataset name suffix. Split out of the query body so
    * a benchmark can warm the writes up and measure only the
    * exchange-free join.
    */
  private val bucketedLock = new Object

  def ensureBucketedTables(s: SparkSession, d: String, buckets: Int = 8): String = bucketedLock.synchronized {
    val suffix = Tables.datasetTag(d, "orders", "customer")
    def ensure(name: String, df: DataFrame, key: String): Unit =
      if (!s.catalog.tableExists(name)) {
        // the in-memory catalog forgets tables across JVMs but the
        // warehouse directory persists — clear any stale location first
        val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        val loc = new java.io.File(wh, name)
        if (loc.exists()) Tables.deleteRecursively(loc)
        df.write.bucketBy(buckets, key).sortBy(key)
          .mode("overwrite").format("parquet").saveAsTable(name)
      }
    ensure(s"orders_bkt_$suffix", Tables.orders(s, d), "o_custkey")
    ensure(s"customer_bkt_$suffix", Tables.customer(s, d), "c_custkey")
    suffix
  }

  /** One-time, idempotent materialization + registration of the
    * lineitem-by-returnflag summary the [[graft.plans.SummaryRewrite]]
    * rule rewrites onto (q240): one row per flag with the exact-integer
    * measures (count, key checksum, part-key min/max). Content-
    * fingerprint keyed like every derived artifact, so a corpus
    * regeneration re-materializes instead of serving stale rows; the
    * rewrite registry keys on the SOURCE file's resolved root path so
    * only scans of this exact table qualify.
    */
  private val summaryLock = new Object

  /** Run `body` with the summary rewrite held OFF: every summary
    * materialization/refresh query is itself a qualifying MV shape,
    * and with the rule still enabled from an earlier run plus a stale
    * registry entry, the optimizer would answer the build from the old
    * summary — writing stale rows under a fresh fingerprint.
    */
  private[graft] def withRewriteOff[A](s: SparkSession)(body: => A): A = {
    val key = graft.plans.SummaryRewrite.EnabledKey
    val prev = s.conf.getOption(key)
    s.conf.set(key, "false")
    try body
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None => s.conf.unset(key)
    }
  }

  /** The resolved root path of a table's file relation — the key the
    * rewrite registry matches scans against.
    */
  private[graft] def sourcePathOf(df: DataFrame): String =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Seq.empty[String]
        }
    }.flatten.head

  /** A freshness probe for a registered summary: true while the source
    * tables' content fingerprint still equals the one captured at
    * registration (a file stat per check — cheap enough for plan time).
    */
  private[graft] def freshnessProbe(d: String, tables: String*): () => Boolean = {
    val atRegister = Tables.datasetTag(d, tables: _*)
    () => Tables.datasetTag(d, tables: _*) == atRegister
  }

  def ensureLineitemSummary(s: SparkSession, d: String): String = summaryLock.synchronized {
    val path = s"${Tables.scratchDir}/graft-lineitem-summary-${Tables.datasetTag(d, "lineitem")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      withRewriteOff(s) {
        Tables.lineitem(s, d).groupBy("l_returnflag")
          .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
            min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))
          .repartition(1)
          .write.mode("overwrite").parquet(path)
      }
    import graft.plans.SummaryRewrite._
    register(sourcePathOf(Tables.lineitem(s, d)), Summary(
      SummaryLocation.FixedPath(path), Seq("l_returnflag"), Map(
        CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
        MinCol("l_partkey") -> "min_part", MaxCol("l_partkey") -> "max_part"),
      freshnessProbe(d, "lineitem")))
    path
  }

  /** The multi-column-grain summary the broadened rewrite serves
    * (q241): one row per (l_returnflag, l_linestatus) with count, the
    * order-key checksum, and the part-key SUM — the pair the rule
    * answers AVG(l_partkey) from. Same build discipline as the
    * single-grain summary above (fingerprint-keyed, rewrite held off
    * during its own materialization, freshness probe registered).
    */
  /** Registration-time guard for the AVG rewrite contract
    * ([[graft.plans.SummaryRewrite.CountCol]]): `Average` accumulates
    * integral inputs in a double buffer, which stays exact only while
    * every intermediate partial is representable — guaranteed for ANY
    * accumulation order and ANY sign mix iff Σ|x| over the aggregated
    * SOURCE relation stays below 2^53 (per-grain summary sums are NOT
    * a sound proxy: {2^53+1, −2^53} nets to 1 in the stored long sum
    * while the fact plan's double buffer already rounded). The scan
    * runs once per artifact — an `_AVGSAFE` marker inside the artifact
    * dir records a passed check, so warm artifacts from earlier rounds
    * (whose build predates the guard) get checked exactly once too,
    * and a swept-and-rebuilt artifact re-checks. An oversized corpus
    * fails the registration loudly instead of diverging from the fact
    * plan by a low bit at query time.
    */
  private[graft] def assertAvgRewriteSafe(rel: => DataFrame, path: String, cols: String*): Unit = {
    // marker VERSIONED like the summary2b path rename: the r13 fix
    // (abs after the decimal cast) changed the check's semantics, so a
    // marker written by the pre-fix check must not suppress the
    // corrected one — _AVGSAFE2 re-runs the guard once per warm artifact
    val marker = new java.io.File(path, "_AVGSAFE2")
    // a stale pre-fix marker in a warm artifact is dead weight once the
    // versioned one exists — drop it so warm directories stay clean
    new java.io.File(path, "_AVGSAFE").delete(): Unit
    if (marker.exists()) return
    // decimal(38,0) accumulation: a Long sum can wrap silently past 2^63
    // in non-ANSI mode, which would let an oversized corpus slip under
    // the 2^53 bound after overflow. A null sum is ambiguous — empty/
    // all-null input (legitimately zero) or decimal overflow in
    // non-ANSI mode (must FAIL, not pass as zero) — so the non-null
    // count disambiguates.
    // abs AFTER the decimal cast: abs() in the column's native integer
    // type wraps negative on Long.MinValue/Int.MinValue in non-ANSI
    // mode, which would under-count Σ|c| and slip past the 2^53 bound
    val aggs = cols.map(c => sum(abs(col(c).cast("decimal(38,0)"))).as(c)) ++
      cols.map(c => count(col(c)).as(s"__cnt_$c"))
    val row = rel.agg(aggs.head, aggs.tail: _*).head()
    val bound = java.math.BigDecimal.valueOf(1L << 53)
    cols.zipWithIndex.foreach { case (c, i) =>
      val nonNull = row.getLong(cols.length + i)
      require(!(row.isNullAt(i) && nonNull > 0),
        s"summary $path: Σ|$c| overflowed decimal(38,0) (non-ANSI null " +
          "sum over a non-empty column) — decline the Sum/Count " +
          "registration for this corpus")
      val v = if (row.isNullAt(i)) java.math.BigDecimal.ZERO else row.getDecimal(i)
      require(v.compareTo(bound) < 0,
        s"summary $path: Σ|$c| = $v ≥ 2^53 over the source relation — " +
          s"AVG($c) through the rewrite could diverge from Average's " +
          "double accumulation; decline the Sum/Count registration for " +
          "this corpus")
    }
    java.nio.file.Files.write(marker.toPath, Array.empty[Byte]): Unit
  }

  def ensureLineitemSummary2(s: SparkSession, d: String): String = summaryLock.synchronized {
    // "2b": the artifact layout gained cnt_part (AVG's true denominator
    // — COUNT(col), since Average ignores nulls) and a renamed path is
    // how a schema change invalidates an already-materialized scratch
    // copy whose key is the SOURCE fingerprint only
    val path = s"${Tables.scratchDir}/graft-lineitem-summary2b-${Tables.datasetTag(d, "lineitem")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      withRewriteOff(s) {
        Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
          .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
            sum("l_partkey").as("sum_part"), count(col("l_partkey")).as("cnt_part"))
          .repartition(1)
          .write.mode("overwrite").parquet(path)
      }
    assertAvgRewriteSafe(Tables.lineitem(s, d), path, "l_partkey")
    import graft.plans.SummaryRewrite._
    register(sourcePathOf(Tables.lineitem(s, d)), Summary(
      SummaryLocation.FixedPath(path), Seq("l_returnflag", "l_linestatus"), Map(
        CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
        SumCol("l_partkey") -> "sum_part", CountCol("l_partkey") -> "cnt_part"),
      freshnessProbe(d, "lineitem")))
    path
  }

  /** q240: the natural fact-table aggregate, answered by the rewrite —
    * the registered plan scans the |flags|-row summary, not lineitem
    * (plan pinned in SummaryRewriteSpec); the oracle recomputes from
    * the fact table, proving the rewrite answer-preserving.
    */
  def summaryAggregate(s: SparkSession, d: String): DataFrame = {
    ensureLineitemSummary(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))
  }

  /** q241: the broadened rewrite — a MULTI-column grain with an AVG
    * measure, the shape real dashboards ask for (group by two
    * dimensions, average a metric). The registered plan scans the
    * |flag × status|-row summary; AVG(l_partkey) is answered as the
    * summary's SUM/COUNT pair divided in double arithmetic, which for
    * integral inputs is bit-identical to Spark's own Average. Oracle
    * recomputes from the fact table with the same exact-integer-sum
    * division.
    */
  def summaryAggregateAvg(s: SparkSession, d: String): DataFrame = {
    ensureLineitemSummary2(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.lineitem(s, d).groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        avg("l_partkey").as("avg_part"))
  }

  /** q242: INCREMENTAL refresh composed with the MV rewrite — the IVM
    * machinery (q130's partial-merge shape) maintaining the registered
    * summary instead of re-materializing it. The corpus is split into a
    * base (~90%) and a delta (~10%) by a deterministic predicate; the
    * base summary materializes once (the "initial MV build"), and the
    * refresh aggregates ONLY the delta and merges the delta partials
    * into the base summary (counts/sums add; min/max via least/greatest
    * — sound for insert-only deltas). The refreshed summary registers
    * for the SAME source+grain as q240's full materialization — content
    * -equal by construction, which the driver proves: the registered
    * query runs the natural fact-table aggregate through the rewrite
    * (serving the REFRESHED summary) and the oracle recomputes from the
    * fact table the plan never scans. At 100 TB this is the difference
    * between a delta-sized refresh job per ingest batch and a full
    * fact-table re-aggregation.
    */
  def ensureLineitemSummaryIncremental(s: SparkSession, d: String): String = summaryLock.synchronized {
    val tag = Tables.datasetTag(d, "lineitem")
    val isDelta = pmod(col("l_orderkey"), lit(10)) === 0
    val basePath = s"${Tables.scratchDir}/graft-lineitem-summary-base-$tag"
    val incrPath = s"${Tables.scratchDir}/graft-lineitem-summary-incr-$tag"
    def aggOf(df: DataFrame): DataFrame =
      df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))
    if (!new java.io.File(basePath, "_SUCCESS").exists())
      withRewriteOff(s) {
        aggOf(Tables.lineitem(s, d).where(!isDelta))
          .repartition(1).write.mode("overwrite").parquet(basePath)
      }
    if (!new java.io.File(incrPath, "_SUCCESS").exists())
      withRewriteOff(s) {
        // the refresh job: delta-only partials + the |groups|-row base
        // summary — no full fact scan anywhere in this plan
        val deltaAgg = aggOf(Tables.lineitem(s, d).where(isDelta))
        def pack(df: DataFrame, t: String): DataFrame = df.select(
          col("l_returnflag"), col("n").as(s"n_$t"),
          col("key_checksum").as(s"k_$t"),
          col("min_part").as(s"mn_$t"), col("max_part").as(s"mx_$t"))
        pack(s.read.parquet(basePath), "b")
          .join(pack(deltaAgg, "d"), Seq("l_returnflag"), "full_outer")
          .select(col("l_returnflag"),
            (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
            (coalesce(col("k_b"), lit(0L)) + coalesce(col("k_d"), lit(0L))).as("key_checksum"),
            least(col("mn_b"), col("mn_d")).as("min_part"), // least/greatest skip nulls
            greatest(col("mx_b"), col("mx_d")).as("max_part"))
          .repartition(1).write.mode("overwrite").parquet(incrPath)
      }
    import graft.plans.SummaryRewrite._
    register(sourcePathOf(Tables.lineitem(s, d)), Summary(
      SummaryLocation.FixedPath(incrPath), Seq("l_returnflag"), Map(
        CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
        MinCol("l_partkey") -> "min_part", MaxCol("l_partkey") -> "max_part"),
      freshnessProbe(d, "lineitem")))
    incrPath
  }

  def summaryAggregateIncremental(s: SparkSession, d: String): DataFrame = {
    ensureLineitemSummaryIncremental(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))
  }

  /** The CDC delta feed q255's refresh consumes: the batch's INSERTS
    * (op = +1; q242's 10%-of-orderkeys class) plus its DELETES (op =
    * −1; "ghost" rows that existed in the pre-batch state and are gone
    * from the current corpus — synthesized deterministically from
    * flag-'A' rows under a shifted orderkey so they collide with
    * nothing real). The shape is exactly q134's snapshot-diff
    * added/removed classes as a single signed stream.
    */
  private def summaryDeltaParts(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val li = Tables.lineitem(s, d)
      .select("l_returnflag", "l_orderkey", "l_partkey")
    val isInsert = pmod(col("l_orderkey"), lit(10)) === 0
    val ghosts = li
      .where(pmod(col("l_orderkey"), lit(17)) === 3 && col("l_returnflag") === "A")
      .withColumn("l_orderkey", col("l_orderkey") + lit(2000000000L))
    val inserts = li.where(isInsert)
    // pre-batch state S0 = (corpus \ inserts) ∪ ghosts; the batch
    // inserts `inserts` and deletes `ghosts`, landing exactly on the
    // current corpus
    val s0 = li.where(!isInsert).unionByName(ghosts)
    val delta = inserts.withColumn("op", lit(1L))
      .unionByName(ghosts.withColumn("op", lit(-1L)))
    (s0, delta)
  }

  /** The grain-bounded MIN/MAX repair scan for delete-touched groups:
    * a fact read FILTERED to exactly the touched grain values (pushed
    * to the scan — partition-prunable when the fact table is laid out
    * by grain at scale), never the full table. Factored out so the
    * spec can pin the pushed filter and the grain list independently.
    */
  private[graft] def minMaxRepairScan(s: SparkSession, d: String,
      touched: Seq[String]): DataFrame =
    Tables.lineitem(s, d)
      .where(col("l_returnflag").isin(touched: _*))
      .groupBy("l_returnflag")
      .agg(min("l_partkey").as("mn_r"), max("l_partkey").as("mx_r"))

  /** The grain values the q255 delta deletes touch — grain-sized.
    * (The refresh itself derives the same list from its in-scope
    * deltaAgg partials; this standalone form is the spec's probe.)
    */
  private[graft] def deleteTouchedGrains(s: SparkSession, d: String): Seq[String] = {
    val (_, delta) = summaryDeltaParts(s, d)
    delta.where(col("op") === -1L).select("l_returnflag").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** q255: DELETE-bearing incremental refresh — the IVM step q242's
    * insert-only path can't take: the delta stream carries deletions
    * (q134's snapshot-diff "removed" class as op = −1 rows). Additive
    * measures subtract exactly (counts and sums consume the SIGNED
    * delta: Σop, Σop·x); MIN/MAX are not invertible under deletes, so
    * every grain group the deletes touch is repaired from the fact
    * rows OF THAT GROUP ONLY ([[minMaxRepairScan]] — the scan's
    * pushed grain filter is what keeps the repair grain-sized instead
    * of fact-sized; untouched groups keep the insert-only
    * least/greatest merge, never rescanned — both spec-pinned). A
    * group whose refreshed count reaches 0 is DROPPED (a fact scan
    * emits no row for an empty group — kept rows would be a phantom).
    * The refreshed summary registers for the same source + grain as
    * q240/q242 (all content-equal to the full aggregate); the driver
    * proves it: q255 runs the natural fact aggregate through the
    * rewrite (serving the delete-refreshed summary) and the oracle
    * recomputes from the fact table the plan never scans. At 100 TB
    * this is the difference between replaying a CDC batch
    * (delta-sized + |touched grains| repair partitions) and a full
    * fact re-aggregation on every delete.
    */
  def ensureLineitemSummaryDeletes(s: SparkSession, d: String): String = summaryLock.synchronized {
    val tag = Tables.datasetTag(d, "lineitem")
    val basePath = s"${Tables.scratchDir}/graft-lineitem-summary-delbase-$tag"
    val refreshedPath = s"${Tables.scratchDir}/graft-lineitem-summary-delincr-$tag"
    val (s0, delta) = summaryDeltaParts(s, d)
    def aggOf(df: DataFrame): DataFrame =
      df.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))
    if (!new java.io.File(basePath, "_SUCCESS").exists())
      withRewriteOff(s) {
        aggOf(s0).repartition(1).write.mode("overwrite").parquet(basePath)
      }
    if (!new java.io.File(refreshedPath, "_SUCCESS").exists())
      withRewriteOff(s) {
        // the refresh job: signed delta partials + the |grains|-row base
        // summary + a repair scan bounded to the delete-touched grains
        val deltaAgg = delta.groupBy("l_returnflag")
          .agg(sum(col("op")).as("n_d"),
            sum(col("op") * col("l_orderkey")).as("k_d"),
            min(when(col("op") === 1L, col("l_partkey"))).as("mn_ins"),
            max(when(col("op") === 1L, col("l_partkey"))).as("mx_ins"),
            max((col("op") === -1L).cast("int")).as("has_del"))
        // touched grains from the partials already computed above —
        // no second delta derivation, no extra fact scan
        val touched = deltaAgg.where(col("has_del") === 1)
          .select("l_returnflag").collect().map(_.getString(0)).toSeq.sorted
        val repair = minMaxRepairScan(s, d, touched)
        s.read.parquet(basePath)
          .select(col("l_returnflag"), col("n").as("n_b"),
            col("key_checksum").as("k_b"),
            col("min_part").as("mn_b"), col("max_part").as("mx_b"))
          .join(deltaAgg, Seq("l_returnflag"), "full_outer")
          .join(repair, Seq("l_returnflag"), "left_outer")
          .select(col("l_returnflag"),
            (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
            (coalesce(col("k_b"), lit(0L)) + coalesce(col("k_d"), lit(0L))).as("key_checksum"),
            when(coalesce(col("has_del"), lit(0)) === 1, col("mn_r"))
              .otherwise(least(col("mn_b"), col("mn_ins"))).as("min_part"),
            when(coalesce(col("has_del"), lit(0)) === 1, col("mx_r"))
              .otherwise(greatest(col("mx_b"), col("mx_ins"))).as("max_part"))
          .where(col("n") > 0)
          .repartition(1).write.mode("overwrite").parquet(refreshedPath)
      }
    import graft.plans.SummaryRewrite._
    register(sourcePathOf(Tables.lineitem(s, d)), Summary(
      SummaryLocation.FixedPath(refreshedPath), Seq("l_returnflag"), Map(
        CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
        MinCol("l_partkey") -> "min_part", MaxCol("l_partkey") -> "max_part"),
      freshnessProbe(d, "lineitem")))
    refreshedPath
  }

  def summaryAggregateDeletes(s: SparkSession, d: String): DataFrame = {
    ensureLineitemSummaryDeletes(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        min("l_partkey").as("min_part"), max("l_partkey").as("max_part"))
  }

  /** q247: the GLOBAL dashboard aggregate — no GROUP BY at all, the
    * single most common warehouse query ("how many rows, total, and
    * average?") — answered by rolling the (flag, status)-grain summary
    * all the way up: an Aggregate over its handful of rows instead of
    * a fact-table scan. COUNT measures coalesce to 0 so an empty fact
    * table answers 0, exactly as the fact scan would (spec-pinned on a
    * synthetic empty table).
    */
  def summaryGlobal(s: SparkSession, d: String): DataFrame = {
    ensureLineitemSummary2(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.lineitem(s, d).agg(
      count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
      avg("l_partkey").as("avg_part"),
      countDistinct(col("l_linestatus")).as("n_status"))
  }

  /** One-time, idempotent materialization + registration of the
    * JOIN-MV: customer ⋈ orders on the custkey equi-pair, aggregated
    * to the market-segment grain. The registry keys on BOTH resolved
    * source paths plus the key pair, so only that exact join
    * qualifies; freshness covers both tables' fingerprints.
    */
  def ensureSegmentOrdersSummary(s: SparkSession, d: String): String = summaryLock.synchronized {
    val path =
      s"${Tables.scratchDir}/graft-seg-orders-summary-${Tables.datasetTag(d, "customer", "orders")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      withRewriteOff(s) {
        Tables.customer(s, d).join(Tables.orders(s, d),
            col("c_custkey") === col("o_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"),
            sum("o_custkey").as("sum_cust"), count(col("o_custkey")).as("cnt_cust"))
          .repartition(1)
          .write.mode("overwrite").parquet(path)
      }
    assertAvgRewriteSafe(Tables.customer(s, d).join(Tables.orders(s, d),
      col("c_custkey") === col("o_custkey")), path, "o_custkey")
    import graft.plans.SummaryRewrite._
    registerJoin(sourcePathOf(Tables.customer(s, d)),
      sourcePathOf(Tables.orders(s, d)),
      JoinSummary("c_custkey", "o_custkey",
        SummaryLocation.FixedPath(path), Seq("c_mktsegment"), Map(
          CountStar -> "n", SumCol("o_orderkey") -> "key_checksum",
          SumCol("o_custkey") -> "sum_cust", CountCol("o_custkey") -> "cnt_cust"),
        freshnessProbe(d, "customer", "orders")))
    path
  }

  /** One-time materialization of the (partkey, suppkey) supply BRIDGE —
    * the composite-key dimension the q273 join-MV sits on: one row per
    * distinct (l_partkey, l_suppkey) pair with its lineitem frequency,
    * the partsupp-shaped relation every TPC-H-like warehouse carries.
    * Columns are ps_-prefixed so the bridge's schema stays disjoint
    * from lineitem's (the rewrite's name-mapping guard requires it).
    */
  private val psBridgeLock = new Object

  def ensurePartsuppBridge(s: SparkSession, d: String): String = psBridgeLock.synchronized {
    val path = s"${Tables.scratchDir}/graft-ps-bridge-${Tables.datasetTag(d, "lineitem")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      withRewriteOff(s) {
        Tables.lineitem(s, d)
          .select(col("l_partkey").as("ps_partkey"),
            col("l_suppkey").as("ps_suppkey"))
          .groupBy("ps_partkey", "ps_suppkey")
          .agg(count(lit(1)).as("ps_cnt"))
          .repartition(8, col("ps_partkey"))
          .write.mode("overwrite").parquet(path)
      }
    path
  }

  /** One-time materialization + registration of the COMPOSITE-key
    * join-MV: lineitem ⋈ bridge on (l_partkey=ps_partkey AND
    * l_suppkey=ps_suppkey), aggregated to the (returnflag, linestatus)
    * grain. The registry entry carries the key-pair SET, so only a
    * query joining on exactly both pairs qualifies — a single-key join
    * against the same pair of tables is a DIFFERENT grain (it fans out
    * across suppliers) and declines, which SummaryRewriteSpec pins.
    */
  def ensureCompositeJoinSummary(s: SparkSession, d: String): String = summaryLock.synchronized {
    val bridge = ensurePartsuppBridge(s, d)
    val path =
      s"${Tables.scratchDir}/graft-composite-summary-${Tables.datasetTag(d, "lineitem")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      withRewriteOff(s) {
        compositeAggOf(Tables.lineitem(s, d), s.read.parquet(bridge))
          .repartition(1)
          .write.mode("overwrite").parquet(path)
      }
    registerCompositeSummary(s, d, bridge, path)
    path
  }

  /** q273: the COMPOSITE-key join-MV rewrite — an aggregate over
    * lineitem ⋈ the (partkey, suppkey) bridge on BOTH key columns,
    * answered from the registered composite summary with NEITHER side
    * scanned. The snowflake/bridge-table shape single-column join-MVs
    * can't serve: the join grain is the two-column pair, and the
    * registry matches the conjunct set exactly — partial or crossed
    * key matches decline (pinned in SummaryRewriteSpec). The oracle
    * recomputes bridge + join from lineitem.
    */
  def summaryCompositeJoin(s: SparkSession, d: String): DataFrame = {
    ensureCompositeJoinSummary(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    compositeAggOf(Tables.lineitem(s, d),
      s.read.parquet(ensurePartsuppBridge(s, d)))
  }

  /** q250: the JOIN-MV rewrite — an aggregate over the customer ⋈
    * orders inner equi-join answered from the registered
    * segment-grain join summary: the rewritten plan scans the
    * |segments|-row summary, joining and scanning NEITHER source
    * table (plan pinned in SummaryRewriteSpec). At 100 TB this is the
    * star-schema dashboard query — fact ⋈ dimension then aggregate —
    * collapsing to a summary lookup. The oracle recomputes the join
    * from both base tables.
    */
  def summaryJoinAggregate(s: SparkSession, d: String): DataFrame = {
    ensureSegmentOrdersSummary(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.customer(s, d).join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"),
        avg("o_custkey").as("avg_cust"))
  }

  /** One-time, idempotent materialization + registration of the
    * 3-table CHAIN-MV: lineitem ⋈ orders ⋈ customer down the
    * l_orderkey=o_orderkey, o_custkey=c_custkey key chain, aggregated
    * to the market-segment grain. The registry keys on the ORDERED
    * source sequence plus the per-position key pairs, so only that
    * exact chain (from either end) qualifies; freshness covers all
    * three tables' fingerprints.
    */
  def ensureLineitemSegmentSummary(s: SparkSession, d: String): String = summaryLock.synchronized {
    val path =
      s"${Tables.scratchDir}/graft-li-seg-summary-${Tables.datasetTag(d, "lineitem", "orders", "customer")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      withRewriteOff(s) {
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
            sum("l_partkey").as("sum_part"), count(col("l_partkey")).as("cnt_part"))
          .repartition(1)
          .write.mode("overwrite").parquet(path)
      }
    assertAvgRewriteSafe(Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey")),
      path, "l_partkey")
    import graft.plans.SummaryRewrite._
    registerChain(
      Seq(sourcePathOf(Tables.lineitem(s, d)),
        sourcePathOf(Tables.orders(s, d)),
        sourcePathOf(Tables.customer(s, d))),
      ChainSummary(Seq(("l_orderkey", "o_orderkey"), ("o_custkey", "c_custkey")),
        SummaryLocation.FixedPath(path), Seq("c_mktsegment"), Map(
          CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
          SumCol("l_partkey") -> "sum_part", CountCol("l_partkey") -> "cnt_part"),
        freshnessProbe(d, "lineitem", "orders", "customer")))
    path
  }

  /** q256: the MULTI-WAY (3-table) join-MV rewrite — lineitem-grain
    * revenue lines rolled through orders to the customer segment,
    * answered from the registered chain summary: the rewritten plan
    * scans the |segments|-row summary and joins/scans NONE of the
    * three base tables (plan pinned in SummaryRewriteSpec, along with
    * declines for a wrong key chain and a non-left-deep association).
    * At 100 TB this is the classic star-chain dashboard query — fact ⋈
    * bridge ⋈ dimension — collapsing to a summary lookup. The oracle
    * recomputes the full 3-way join.
    */
  def summaryChainAggregate(s: SparkSession, d: String): DataFrame = {
    ensureLineitemSegmentSummary(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        avg("l_partkey").as("avg_part"))
  }

  /** One-time materialization + registration of the SNOWFLAKE chain-MV:
    * two dimensions off ONE fact — lineitem ⋈ orders on the order key
    * AND lineitem ⋈ part on the part key, grain spanning both dims
    * ((o_orderpriority, p_type)). The chain registry already encodes
    * this: the left-deep flattening orients hop 2's key pair
    * (l_partkey, p_partkey) from the ACCUMULATED subtree — the key
    * comes from the fact leaf, not the previous dim, which is exactly
    * what distinguishes a snowflake from q256's linear chain. The
    * registration closes the r11 coverage gap where this shape
    * declined for lack of a registered entry.
    */
  def ensureSnowflakeSummary(s: SparkSession, d: String): String = summaryLock.synchronized {
    val path =
      s"${Tables.scratchDir}/graft-snowflake-summary-${Tables.datasetTag(d, "lineitem", "orders", "part")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      withRewriteOff(s) {
        snowflakeAggOf(Tables.lineitem(s, d), Tables.orders(s, d),
            Tables.part(s, d))
          .repartition(1)
          .write.mode("overwrite").parquet(path)
      }
    registerSnowflakeSummary(s, d, path)
    path
  }

  /** q276: the SNOWFLAKE-MV rewrite — an aggregate over fact ⋈ dim1 ⋈
    * dim2 (lineitem with BOTH orders and part hanging off it), grain
    * across both dimensions, answered from the registered snowflake
    * summary with none of the three tables scanned. The star-schema
    * dashboard shape q256's linear chain (fact → bridge → dim) cannot
    * express: hop 2 keys off the FACT leaf, not the previous hop's
    * table. Decline pins in SummaryRewriteSpec cover a wrong second-hop
    * key; the oracle recomputes the 3-way join.
    */
  def summarySnowflakeAggregate(s: SparkSession, d: String): DataFrame = {
    ensureSnowflakeSummary(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    snowflakeAggOf(Tables.lineitem(s, d), Tables.orders(s, d), Tables.part(s, d))
  }

  /** The composite-MV aggregate shape shared by the full (q273),
    * incremental (q281), and delete-bearing (q282) builders — one
    * definition so the three refresh paths provably maintain the SAME
    * summary.
    */
  private def compositeAggOf(l: DataFrame, b: DataFrame): DataFrame =
    l.join(b, col("l_partkey") === col("ps_partkey") &&
        col("l_suppkey") === col("ps_suppkey"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        sum("ps_cnt").as("sum_pscnt"))

  /** Merge additive delta partials into a base summary on an arbitrary
    * grain: one |grain|-row full-outer join, every measure
    * coalesce(base,0)+coalesce(delta,0) — the q252/q258 merge
    * generalized to multi-column grains (q281–q284 group on two). ONE
    * definition shared with every stream-maintained snapshot merge in
    * `streaming.Streams` (q261/q266/q268/q286's store/q288/q289) so
    * the batch-IVM and stream merge semantics cannot drift.
    */
  private[graft] def additiveMergeOn(base: DataFrame, delta: DataFrame,
      grain: Seq[String], measures: Seq[String]): DataFrame = {
    def pack(df: DataFrame, t: String): DataFrame =
      measures.foldLeft(df)((acc, m) => acc.withColumnRenamed(m, s"${m}_$t"))
    pack(base, "b").join(pack(delta, "d"), grain, "full_outer")
      .select(grain.map(col) ++ measures.map(m =>
        (coalesce(col(s"${m}_b"), lit(0L)) + coalesce(col(s"${m}_d"), lit(0L)))
          .as(m)): _*)
  }

  /** Register the composite-key summary at `path` — shared by q273's
    * full build and the q281/q282 refreshes (same slot, same key-pair
    * set, same grain, same measure map: the refreshed summaries are
    * content-equal to the full build by construction, so replacing the
    * registration preserves every rewrite the earlier entry answered).
    */
  private def registerCompositeSummary(s: SparkSession, d: String,
      bridge: String, path: String): Unit = {
    import graft.plans.SummaryRewrite._
    registerCompositeJoin(sourcePathOf(Tables.lineitem(s, d)),
      sourcePathOf(s.read.parquet(bridge)),
      CompositeJoinSummary(Seq(("l_partkey", "ps_partkey"), ("l_suppkey", "ps_suppkey")),
        SummaryLocation.FixedPath(path), Seq("l_returnflag", "l_linestatus"), Map(
          CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
          SumCol("ps_cnt") -> "sum_pscnt"),
        freshnessProbe(d, "lineitem")))
  }

  /** q281: INCREMENTAL refresh of the COMPOSITE-key join-MV — q252's
    * two-sided delta-join expansion on the (partkey, suppkey) bridge:
    * with L = L₀ ∪ ΔL and B = B₀ ∪ ΔB, the composite join expands into
    * four terms of which only L₀⋈B₀ is the base, so the refresh
    * aggregates the three Δ-terms (each has a delta factor — work is
    * delta-bound; the full-side probes are the key-partitioned index
    * lookups a production store serves) in one unioned pass and merges
    * the partials additively into the base summary (counts and sums
    * only on this grain). Registers for the SAME key-pair set + grain
    * as q273's full build; the driver proves content equality (the
    * oracle recomputes bridge + join from lineitem).
    */
  def ensureCompositeJoinSummaryIncremental(s: SparkSession, d: String): String = summaryLock.synchronized {
    val bridge = ensurePartsuppBridge(s, d)
    val tag = Tables.datasetTag(d, "lineitem")
    val basePath = s"${Tables.scratchDir}/graft-composite-base-$tag"
    val incrPath = s"${Tables.scratchDir}/graft-composite-incr-$tag"
    val isDeltaL = pmod(col("l_orderkey") + col("l_partkey"), lit(9)) === 0
    val isDeltaB = pmod(col("ps_partkey") + col("ps_suppkey"), lit(10)) === 0
    val br = s.read.parquet(bridge)
    val (l0, dl) = (Tables.lineitem(s, d).where(!isDeltaL),
      Tables.lineitem(s, d).where(isDeltaL))
    val (b0, db) = (br.where(!isDeltaB), br.where(isDeltaB))
    if (!new java.io.File(basePath, "_SUCCESS").exists())
      withRewriteOff(s) {
        compositeAggOf(l0, b0).repartition(1)
          .write.mode("overwrite").parquet(basePath)
      }
    if (!new java.io.File(incrPath, "_SUCCESS").exists())
      withRewriteOff(s) {
        val deltaAgg = compositeAggOf(dl, b0)
          .unionByName(compositeAggOf(l0, db))
          .unionByName(compositeAggOf(dl, db))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum("n").as("n"), sum("key_checksum").as("key_checksum"),
            sum("sum_pscnt").as("sum_pscnt"))
        additiveMergeOn(s.read.parquet(basePath), deltaAgg,
            Seq("l_returnflag", "l_linestatus"),
            Seq("n", "key_checksum", "sum_pscnt"))
          .repartition(1).write.mode("overwrite").parquet(incrPath)
      }
    registerCompositeSummary(s, d, bridge, incrPath)
    incrPath
  }

  def summaryCompositeIncremental(s: SparkSession, d: String): DataFrame = {
    ensureCompositeJoinSummaryIncremental(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    compositeAggOf(Tables.lineitem(s, d),
      s.read.parquet(ensurePartsuppBridge(s, d)))
  }

  /** q282: DELETE-bearing refresh of the COMPOSITE-key join-MV — q262's
    * signed-delta machinery on the two-column bridge grain: the CDC
    * batch inserts and deletes LINEITEM rows (ghosts are exact
    * duplicates of existing lines, so they joined the bridge in the
    * pre-batch state and the post-batch state is exactly the current
    * table), every registered measure is additive, so the refresh is
    * ONE op-weighted signed delta join through the unchanged bridge
    * merged additively into the base — no repair scan. Zero-count
    * groups drop. Same registration slot as q273/q281.
    */
  def ensureCompositeJoinSummaryDeletes(s: SparkSession, d: String): String = summaryLock.synchronized {
    val bridge = ensurePartsuppBridge(s, d)
    val tag = Tables.datasetTag(d, "lineitem")
    val basePath = s"${Tables.scratchDir}/graft-composite-delbase-$tag"
    val refreshedPath = s"${Tables.scratchDir}/graft-composite-delincr-$tag"
    val li = Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_returnflag", "l_linestatus")
    val isInsert = pmod(col("l_orderkey") + col("l_partkey"), lit(9)) === 0
    val ghosts = li.where(pmod(col("l_orderkey") + col("l_partkey"), lit(11)) === 4)
    val s0 = li.where(!isInsert).unionByName(ghosts)
    val delta = li.where(isInsert).withColumn("op", lit(1L))
      .unionByName(ghosts.withColumn("op", lit(-1L)))
    val br = s.read.parquet(bridge)
    if (!new java.io.File(basePath, "_SUCCESS").exists())
      withRewriteOff(s) {
        compositeAggOf(s0, br).repartition(1)
          .write.mode("overwrite").parquet(basePath)
      }
    if (!new java.io.File(refreshedPath, "_SUCCESS").exists())
      withRewriteOff(s) {
        val deltaAgg = delta.join(br,
            col("l_partkey") === col("ps_partkey") &&
              col("l_suppkey") === col("ps_suppkey"))
          .groupBy("l_returnflag", "l_linestatus")
          .agg(sum(col("op")).as("n"),
            sum(col("op") * col("l_orderkey")).as("key_checksum"),
            sum(col("op") * col("ps_cnt")).as("sum_pscnt"))
        additiveMergeOn(s.read.parquet(basePath), deltaAgg,
            Seq("l_returnflag", "l_linestatus"),
            Seq("n", "key_checksum", "sum_pscnt"))
          .where(col("n") > 0)
          .repartition(1).write.mode("overwrite").parquet(refreshedPath)
      }
    registerCompositeSummary(s, d, bridge, refreshedPath)
    refreshedPath
  }

  def summaryCompositeDeletes(s: SparkSession, d: String): DataFrame = {
    ensureCompositeJoinSummaryDeletes(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    compositeAggOf(Tables.lineitem(s, d),
      s.read.parquet(ensurePartsuppBridge(s, d)))
  }

  /** The snowflake aggregate shape shared by the full (q276),
    * incremental (q283), and delete-bearing (q284) builders.
    */
  private def snowflakeAggOf(l: DataFrame, o: DataFrame, p: DataFrame): DataFrame =
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .groupBy("o_orderpriority", "p_type")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        sum("p_size").as("sum_size"))

  /** Register the snowflake chain summary at `path` — shared by q276's
    * full build and the q283/q284 refreshes (same slot semantics as
    * [[registerCompositeSummary]]).
    */
  private def registerSnowflakeSummary(s: SparkSession, d: String,
      path: String): Unit = {
    import graft.plans.SummaryRewrite._
    registerChain(
      Seq(sourcePathOf(Tables.lineitem(s, d)),
        sourcePathOf(Tables.orders(s, d)),
        sourcePathOf(Tables.part(s, d))),
      ChainSummary(Seq(("l_orderkey", "o_orderkey"), ("l_partkey", "p_partkey")),
        SummaryLocation.FixedPath(path), Seq("o_orderpriority", "p_type"), Map(
          CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
          SumCol("p_size") -> "sum_size"),
        freshnessProbe(d, "lineitem", "orders", "part")))
  }

  /** q283: INCREMENTAL refresh of the SNOWFLAKE-MV — q258's 2³−1 = 7
    * delta-term expansion re-oriented for two dimensions off ONE fact:
    * with L = L₀ ∪ ΔL, O = O₀ ∪ ΔO, P = P₀ ∪ ΔP, the snowflake
    * L ⋈ O ⋈ P expands into 8 terms of which only L₀⋈O₀⋈P₀ is the
    * base — the refresh aggregates the seven Δ-terms (hop 2 keys off
    * the FACT side, which is exactly what distinguishes this from
    * q258's linear chain) in one unioned pass and merges additively.
    * Same registration slot as q276's full build.
    */
  def ensureSnowflakeSummaryIncremental(s: SparkSession, d: String): String = summaryLock.synchronized {
    val tag = Tables.datasetTag(d, "lineitem", "orders", "part")
    val basePath = s"${Tables.scratchDir}/graft-snowflake-base-$tag"
    val incrPath = s"${Tables.scratchDir}/graft-snowflake-incr-$tag"
    val isDeltaL = pmod(col("l_orderkey") + col("l_partkey"), lit(9)) === 0
    val isDeltaO = pmod(col("o_orderkey"), lit(7)) === 0
    val isDeltaP = pmod(col("p_partkey"), lit(10)) === 0
    val (l0, dl) = (Tables.lineitem(s, d).where(!isDeltaL),
      Tables.lineitem(s, d).where(isDeltaL))
    val (o0, dor) = (Tables.orders(s, d).where(!isDeltaO),
      Tables.orders(s, d).where(isDeltaO))
    val (p0, dp) = (Tables.part(s, d).where(!isDeltaP),
      Tables.part(s, d).where(isDeltaP))
    if (!new java.io.File(basePath, "_SUCCESS").exists())
      withRewriteOff(s) {
        snowflakeAggOf(l0, o0, p0).repartition(1)
          .write.mode("overwrite").parquet(basePath)
      }
    if (!new java.io.File(incrPath, "_SUCCESS").exists())
      withRewriteOff(s) {
        val terms = for {
          li <- Seq(false, true); oi <- Seq(false, true); pi <- Seq(false, true)
          if li || oi || pi
        } yield snowflakeAggOf(if (li) dl else l0, if (oi) dor else o0,
          if (pi) dp else p0)
        val deltaAgg = terms.reduce(_ unionByName _)
          .groupBy("o_orderpriority", "p_type")
          .agg(sum("n").as("n"), sum("key_checksum").as("key_checksum"),
            sum("sum_size").as("sum_size"))
        additiveMergeOn(s.read.parquet(basePath), deltaAgg,
            Seq("o_orderpriority", "p_type"),
            Seq("n", "key_checksum", "sum_size"))
          .repartition(1).write.mode("overwrite").parquet(incrPath)
      }
    registerSnowflakeSummary(s, d, incrPath)
    incrPath
  }

  def summarySnowflakeIncremental(s: SparkSession, d: String): DataFrame = {
    ensureSnowflakeSummaryIncremental(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    snowflakeAggOf(Tables.lineitem(s, d), Tables.orders(s, d), Tables.part(s, d))
  }

  /** q284: DELETE-bearing refresh of the SNOWFLAKE-MV — q262's signed
    * fact-side CDC through TWO static dimensions: ghosts are exact
    * duplicates of existing lines (both join keys intact, so they
    * joined both dims in the pre-batch state; post-batch state is
    * exactly the current table), all measures additive, one op-weighted
    * delta join merged additively, zero-count groups drop. Completes
    * the refresh matrix for both MV shapes added in round 12.
    */
  def ensureSnowflakeSummaryDeletes(s: SparkSession, d: String): String = summaryLock.synchronized {
    val tag = Tables.datasetTag(d, "lineitem", "orders", "part")
    val basePath = s"${Tables.scratchDir}/graft-snowflake-delbase-$tag"
    val refreshedPath = s"${Tables.scratchDir}/graft-snowflake-delincr-$tag"
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
    val isInsert = pmod(col("l_orderkey") + col("l_partkey"), lit(9)) === 0
    val ghosts = li.where(pmod(col("l_orderkey") + col("l_partkey"), lit(11)) === 4)
    val s0 = li.where(!isInsert).unionByName(ghosts)
    val delta = li.where(isInsert).withColumn("op", lit(1L))
      .unionByName(ghosts.withColumn("op", lit(-1L)))
    if (!new java.io.File(basePath, "_SUCCESS").exists())
      withRewriteOff(s) {
        snowflakeAggOf(s0, Tables.orders(s, d), Tables.part(s, d))
          .repartition(1).write.mode("overwrite").parquet(basePath)
      }
    if (!new java.io.File(refreshedPath, "_SUCCESS").exists())
      withRewriteOff(s) {
        val deltaAgg = delta
          .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
          .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
          .groupBy("o_orderpriority", "p_type")
          .agg(sum(col("op")).as("n"),
            sum(col("op") * col("l_orderkey")).as("key_checksum"),
            sum(col("op") * col("p_size")).as("sum_size"))
        additiveMergeOn(s.read.parquet(basePath), deltaAgg,
            Seq("o_orderpriority", "p_type"),
            Seq("n", "key_checksum", "sum_size"))
          .where(col("n") > 0)
          .repartition(1).write.mode("overwrite").parquet(refreshedPath)
      }
    registerSnowflakeSummary(s, d, refreshedPath)
    refreshedPath
  }

  def summarySnowflakeDeletes(s: SparkSession, d: String): DataFrame = {
    ensureSnowflakeSummaryDeletes(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    snowflakeAggOf(Tables.lineitem(s, d), Tables.orders(s, d), Tables.part(s, d))
  }

  /** q258: INCREMENTAL refresh of the 3-table CHAIN-MV — q252's
    * two-sided delta-join expansion generalized to three sides: with
    * L = L₀ ∪ ΔL, O = O₀ ∪ ΔO, C = C₀ ∪ ΔC, the chain L ⋈ O ⋈ C
    * expands into 2³ terms of which only L₀⋈O₀⋈C₀ is the base — the
    * refresh aggregates the SEVEN Δ-terms (every one has at least one
    * delta factor, so the aggregate work is delta-bound; the full-side
    * probes are the index lookups a key-partitioned store serves) in
    * one unioned pass and merges the partials additively into the base
    * summary (counts and sums only on this grain). The refreshed
    * summary registers for the SAME chain as q256's full
    * materialization — content-equal by construction, which the driver
    * proves: q258 runs the natural 3-way aggregate through the rewrite
    * and the oracle recomputes the full join. At 100 TB this is one
    * ingest batch refreshing a star-chain dashboard summary without
    * ever re-joining the three base tables in full.
    */
  def ensureLineitemSegmentSummaryIncremental(s: SparkSession, d: String): String = summaryLock.synchronized {
    val tag = Tables.datasetTag(d, "lineitem", "orders", "customer")
    val basePath = s"${Tables.scratchDir}/graft-li-seg-base-$tag"
    val incrPath = s"${Tables.scratchDir}/graft-li-seg-incr-$tag"
    val isDeltaL = pmod(col("l_orderkey") + col("l_partkey"), lit(9)) === 0
    val isDeltaO = pmod(col("o_orderkey"), lit(7)) === 0
    val isDeltaC = pmod(col("c_custkey"), lit(10)) === 0
    def aggOf(l: DataFrame, o: DataFrame, c: DataFrame): DataFrame =
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
          sum("l_partkey").as("sum_part"), count(col("l_partkey")).as("cnt_part"))
    val (l0, dl) = (Tables.lineitem(s, d).where(!isDeltaL),
      Tables.lineitem(s, d).where(isDeltaL))
    val (o0, dor) = (Tables.orders(s, d).where(!isDeltaO),
      Tables.orders(s, d).where(isDeltaO))
    val (c0, dc) = (Tables.customer(s, d).where(!isDeltaC),
      Tables.customer(s, d).where(isDeltaC))
    if (!new java.io.File(basePath, "_SUCCESS").exists())
      withRewriteOff(s) {
        aggOf(l0, o0, c0).repartition(1).write.mode("overwrite").parquet(basePath)
      }
    if (!new java.io.File(incrPath, "_SUCCESS").exists())
      withRewriteOff(s) {
        // the 7 delta terms (every side-combination except base³),
        // aggregated together in ONE pass, then merged into the base
        val terms = for {
          li <- Seq(false, true); oi <- Seq(false, true); ci <- Seq(false, true)
          if li || oi || ci
        } yield aggOf(if (li) dl else l0, if (oi) dor else o0,
          if (ci) dc else c0)
        val deltaAgg = terms.reduce(_ unionByName _)
          .groupBy("c_mktsegment")
          .agg(sum("n").as("n"), sum("key_checksum").as("key_checksum"),
            sum("sum_part").as("sum_part"), sum("cnt_part").as("cnt_part"))
        def pack(df: DataFrame, t: String): DataFrame = df.select(
          col("c_mktsegment"), col("n").as(s"n_$t"),
          col("key_checksum").as(s"k_$t"),
          col("sum_part").as(s"s_$t"), col("cnt_part").as(s"c_$t"))
        pack(s.read.parquet(basePath), "b")
          .join(pack(deltaAgg, "d"), Seq("c_mktsegment"), "full_outer")
          .select(col("c_mktsegment"),
            (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
            (coalesce(col("k_b"), lit(0L)) + coalesce(col("k_d"), lit(0L))).as("key_checksum"),
            (coalesce(col("s_b"), lit(0L)) + coalesce(col("s_d"), lit(0L))).as("sum_part"),
            (coalesce(col("c_b"), lit(0L)) + coalesce(col("c_d"), lit(0L))).as("cnt_part"))
          .repartition(1).write.mode("overwrite").parquet(incrPath)
      }
    assertAvgRewriteSafe(Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey")),
      incrPath, "l_partkey")
    import graft.plans.SummaryRewrite._
    registerChain(
      Seq(sourcePathOf(Tables.lineitem(s, d)),
        sourcePathOf(Tables.orders(s, d)),
        sourcePathOf(Tables.customer(s, d))),
      ChainSummary(Seq(("l_orderkey", "o_orderkey"), ("o_custkey", "c_custkey")),
        SummaryLocation.FixedPath(incrPath), Seq("c_mktsegment"), Map(
          CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
          SumCol("l_partkey") -> "sum_part", CountCol("l_partkey") -> "cnt_part"),
        freshnessProbe(d, "lineitem", "orders", "customer")))
    incrPath
  }

  /** q262: DELETE-bearing refresh of the CHAIN-MV — the last cell of
    * the IVM matrix ({single-table, join, chain} × {insert-only,
    * delete-bearing}). The CDC batch inserts and deletes LINEITEM rows
    * (the ghosts are corrected lines: same l_orderkey — so they joined
    * orders in the pre-batch state — different l_partkey), and since
    * every measure on this grain is additive (counts and sums; no
    * min/max registered), the whole refresh is ONE op-weighted signed
    * delta join through the unchanged bridge and dimension tables,
    * merged additively into the base summary — no repair scan needed
    * anywhere, the cheapest cell of the matrix. Zero-count groups
    * drop. Registers for the same chain as q256/q258; the driver
    * proves the refreshed summary equals the full 3-way recompute.
    */
  def ensureLineitemSegmentSummaryDeletes(s: SparkSession, d: String): String = summaryLock.synchronized {
    val tag = Tables.datasetTag(d, "lineitem", "orders", "customer")
    val basePath = s"${Tables.scratchDir}/graft-li-seg-delbase-$tag"
    val refreshedPath = s"${Tables.scratchDir}/graft-li-seg-delincr-$tag"
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_partkey")
    val isInsert = pmod(col("l_orderkey") + col("l_partkey"), lit(9)) === 0
    val ghosts = li.where(pmod(col("l_orderkey") + col("l_partkey"), lit(11)) === 4)
      .withColumn("l_partkey", col("l_partkey") + lit(5000000L))
    val s0 = li.where(!isInsert).unionByName(ghosts)
    val delta = li.where(isInsert).withColumn("op", lit(1L))
      .unionByName(ghosts.withColumn("op", lit(-1L)))
    def joined(l: DataFrame): DataFrame =
      l.join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
    if (!new java.io.File(basePath, "_SUCCESS").exists())
      withRewriteOff(s) {
        joined(s0).groupBy("c_mktsegment")
          .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
            sum("l_partkey").as("sum_part"), count(col("l_partkey")).as("cnt_part"))
          .repartition(1).write.mode("overwrite").parquet(basePath)
      }
    if (!new java.io.File(refreshedPath, "_SUCCESS").exists())
      withRewriteOff(s) {
        val deltaAgg = joined(delta).groupBy("c_mktsegment")
          .agg(sum(col("op")).as("n_d"),
            sum(col("op") * col("l_orderkey")).as("k_d"),
            sum(col("op") * col("l_partkey")).as("s_d"),
            sum(col("op") * col("l_partkey").isNotNull.cast("long")).as("c_d"))
        s.read.parquet(basePath)
          .select(col("c_mktsegment"), col("n").as("n_b"),
            col("key_checksum").as("k_b"),
            col("sum_part").as("s_b"), col("cnt_part").as("c_b"))
          .join(deltaAgg, Seq("c_mktsegment"), "full_outer")
          .select(col("c_mktsegment"),
            (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
            (coalesce(col("k_b"), lit(0L)) + coalesce(col("k_d"), lit(0L))).as("key_checksum"),
            (coalesce(col("s_b"), lit(0L)) + coalesce(col("s_d"), lit(0L))).as("sum_part"),
            (coalesce(col("c_b"), lit(0L)) + coalesce(col("c_d"), lit(0L))).as("cnt_part"))
          .where(col("n") > 0)
          .repartition(1).write.mode("overwrite").parquet(refreshedPath)
      }
    assertAvgRewriteSafe(Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey")),
      refreshedPath, "l_partkey")
    import graft.plans.SummaryRewrite._
    registerChain(
      Seq(sourcePathOf(Tables.lineitem(s, d)),
        sourcePathOf(Tables.orders(s, d)),
        sourcePathOf(Tables.customer(s, d))),
      ChainSummary(Seq(("l_orderkey", "o_orderkey"), ("o_custkey", "c_custkey")),
        SummaryLocation.FixedPath(refreshedPath), Seq("c_mktsegment"), Map(
          CountStar -> "n", SumCol("l_orderkey") -> "key_checksum",
          SumCol("l_partkey") -> "sum_part", CountCol("l_partkey") -> "cnt_part"),
        freshnessProbe(d, "lineitem", "orders", "customer")))
    refreshedPath
  }

  def summaryChainDeletes: (SparkSession, String) => DataFrame = (s, d) => {
    ensureLineitemSegmentSummaryDeletes(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        avg("l_partkey").as("avg_part"))
  }

  def summaryChainIncremental(s: SparkSession, d: String): DataFrame = {
    ensureLineitemSegmentSummaryIncremental(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        avg("l_partkey").as("avg_part"))
  }

  /** The signed order-side CDC feed q259's join-MV refresh consumes:
    * ghost orders (deleted by the batch — synthesized from BUILDING-
    * segment customers' orders under shifted keys, so the deletes
    * touch a strict subset of the grain) and insert orders (q252's
    * mod-7 class), as one op = ±1 stream. Customers stay static —
    * the single-sided delete case; two-sided insert deltas are q252.
    */
  private def joinDeltaParts(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val isInsert = pmod(col("o_orderkey"), lit(7)) === 0
    val buildingCust = Tables.customer(s, d)
      .where(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val ghosts = o.where(pmod(col("o_orderkey"), lit(13)) === 5)
      .join(buildingCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .withColumn("o_orderkey", col("o_orderkey") + lit(2000000000L))
    val o0 = o.where(!isInsert).unionByName(ghosts)
    val delta = o.where(isInsert).withColumn("op", lit(1L))
      .unionByName(ghosts.withColumn("op", lit(-1L)))
    (o0, delta)
  }

  /** The grain-bounded MIN/MAX repair for the join-MV's delete-touched
    * groups: the dimension-side grain predicate is pushed to the
    * customer scan and the join prunes the order side to exactly the
    * touched segments' customers — repair work is bounded by the
    * touched grains, not the fact table.
    */
  private[graft] def joinMinMaxRepairScan(s: SparkSession, d: String,
      touched: Seq[String]): DataFrame =
    Tables.customer(s, d)
      .where(col("c_mktsegment").isin(touched: _*))
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(min("o_custkey").as("mn_r"), max("o_custkey").as("mx_r"))

  /** The segments the q259 deletes touch — grain-sized (the ghosts'
    * customers are all BUILDING by construction, but derived from the
    * delta itself, not assumed).
    */
  private[graft] def joinDeleteTouchedGrains(s: SparkSession, d: String): Seq[String] = {
    val (_, delta) = joinDeltaParts(s, d)
    delta.where(col("op") === -1L)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select("c_mktsegment").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
  }

  /** q259: DELETE-bearing refresh of the JOIN-MV — q255's signed-delta
    * machinery composed with q250's join summary: the CDC batch
    * deletes (and inserts) ORDER rows, so the refresh joins the signed
    * delta through the static customer dimension, aggregates
    * op-weighted partials (counts and sums subtract exactly), and
    * repairs MIN/MAX only for the grain groups the deletes touch —
    * via [[joinMinMaxRepairScan]], whose dimension-side grain filter
    * is pushed to the customer scan (spec-pinned, touched grains a
    * strict subset: the ghosts are drawn from one segment's
    * customers). Zero-count groups drop. The refreshed summary
    * registers for the same source pair + key pair + grain as q250;
    * the driver proves it equals the full join recompute. This
    * completes the IVM matrix: {single-table, join, chain} ×
    * {insert-only, delete-bearing}.
    */
  def ensureSegmentOrdersSummaryDeletes(s: SparkSession, d: String): String = summaryLock.synchronized {
    val tag = Tables.datasetTag(d, "customer", "orders")
    val basePath = s"${Tables.scratchDir}/graft-seg-orders-delbase-$tag"
    val refreshedPath = s"${Tables.scratchDir}/graft-seg-orders-delincr-$tag"
    val (o0, delta) = joinDeltaParts(s, d)
    val cust = Tables.customer(s, d).select("c_custkey", "c_mktsegment")
    // measure SUPERSET of q250/q252's entry (sum/cnt kept alongside the
    // new min/max): this ensure REPLACES the same (source pair, keys,
    // grain) registry slot, so it must still answer everything the
    // earlier entries answered (q250's AVG) or a later registration
    // order would silently decline those rewrites
    def aggOf(o: DataFrame): DataFrame =
      cust.join(o, col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"),
          sum("o_custkey").as("sum_cust"), count(col("o_custkey")).as("cnt_cust"),
          min("o_custkey").as("min_cust"), max("o_custkey").as("max_cust"))
    if (!new java.io.File(basePath, "_SUCCESS").exists())
      withRewriteOff(s) {
        aggOf(o0).repartition(1).write.mode("overwrite").parquet(basePath)
      }
    if (!new java.io.File(refreshedPath, "_SUCCESS").exists())
      withRewriteOff(s) {
        val deltaAgg = cust
          .join(delta, col("c_custkey") === col("o_custkey"))
          .groupBy("c_mktsegment")
          .agg(sum(col("op")).as("n_d"),
            sum(col("op") * col("o_orderkey")).as("k_d"),
            sum(col("op") * col("o_custkey")).as("s_d"),
            sum(col("op") * col("o_custkey").isNotNull.cast("long")).as("c_d"),
            min(when(col("op") === 1L, col("o_custkey"))).as("mn_ins"),
            max(when(col("op") === 1L, col("o_custkey"))).as("mx_ins"),
            max((col("op") === -1L).cast("int")).as("has_del"))
        // touched segments from the partials already computed above
        val touched = deltaAgg.where(col("has_del") === 1)
          .select("c_mktsegment").collect().map(_.getString(0)).toSeq.sorted
        val repair = joinMinMaxRepairScan(s, d, touched)
        s.read.parquet(basePath)
          .select(col("c_mktsegment"), col("n").as("n_b"),
            col("key_checksum").as("k_b"),
            col("sum_cust").as("s_b"), col("cnt_cust").as("c_b"),
            col("min_cust").as("mn_b"), col("max_cust").as("mx_b"))
          .join(deltaAgg, Seq("c_mktsegment"), "full_outer")
          .join(repair, Seq("c_mktsegment"), "left_outer")
          .select(col("c_mktsegment"),
            (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
            (coalesce(col("k_b"), lit(0L)) + coalesce(col("k_d"), lit(0L))).as("key_checksum"),
            (coalesce(col("s_b"), lit(0L)) + coalesce(col("s_d"), lit(0L))).as("sum_cust"),
            (coalesce(col("c_b"), lit(0L)) + coalesce(col("c_d"), lit(0L))).as("cnt_cust"),
            when(coalesce(col("has_del"), lit(0)) === 1, col("mn_r"))
              .otherwise(least(col("mn_b"), col("mn_ins"))).as("min_cust"),
            when(coalesce(col("has_del"), lit(0)) === 1, col("mx_r"))
              .otherwise(greatest(col("mx_b"), col("mx_ins"))).as("max_cust"))
          .where(col("n") > 0)
          .repartition(1).write.mode("overwrite").parquet(refreshedPath)
      }
    assertAvgRewriteSafe(Tables.customer(s, d).join(Tables.orders(s, d),
      col("c_custkey") === col("o_custkey")), refreshedPath, "o_custkey")
    import graft.plans.SummaryRewrite._
    registerJoin(sourcePathOf(Tables.customer(s, d)),
      sourcePathOf(Tables.orders(s, d)),
      JoinSummary("c_custkey", "o_custkey",
        SummaryLocation.FixedPath(refreshedPath), Seq("c_mktsegment"), Map(
          CountStar -> "n", SumCol("o_orderkey") -> "key_checksum",
          SumCol("o_custkey") -> "sum_cust", CountCol("o_custkey") -> "cnt_cust",
          MinCol("o_custkey") -> "min_cust", MaxCol("o_custkey") -> "max_cust"),
        freshnessProbe(d, "customer", "orders")))
    refreshedPath
  }

  def summaryJoinDeletes(s: SparkSession, d: String): DataFrame = {
    ensureSegmentOrdersSummaryDeletes(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.customer(s, d).select("c_custkey", "c_mktsegment")
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"),
        min("o_custkey").as("min_cust"), max("o_custkey").as("max_cust"))
  }

  /** q252: INCREMENTAL refresh of the JOIN-MV — the two-sided
    * delta-join expansion (q181's IVM identity) maintaining q250's
    * summary: with C = C₀ ∪ ΔC and O = O₀ ∪ ΔO,
    * C ⋈ O = C₀⋈O₀ ∪ ΔC⋈O₀ ∪ C₀⋈ΔO ∪ ΔC⋈ΔO, so the refresh
    * aggregates only the three Δ-terms (each join has a delta side —
    * the aggregate work is delta-bound; the full-side probe is what a
    * key-partitioned stored table serves as an index lookup at scale)
    * and MERGES the partials into the base summary: every measure here
    * is additive (counts and sums — no min/max registered on this
    * grain), so the merge is one |segments|-row outer join. The
    * refreshed summary registers for the SAME source pair + key pair +
    * grain as q250's full materialization — content-equal by
    * construction, which the driver proves: q252 runs the natural join
    * aggregate through the rewrite (serving the REFRESHED summary) and
    * the oracle recomputes from both base tables.
    */
  def ensureSegmentOrdersSummaryIncremental(s: SparkSession, d: String): String = summaryLock.synchronized {
    val tag = Tables.datasetTag(d, "customer", "orders")
    val basePath = s"${Tables.scratchDir}/graft-seg-orders-base-$tag"
    val incrPath = s"${Tables.scratchDir}/graft-seg-orders-incr-$tag"
    val isDeltaC = pmod(col("c_custkey"), lit(10)) === 0
    val isDeltaO = pmod(col("o_orderkey"), lit(7)) === 0
    def aggOf(c: DataFrame, o: DataFrame): DataFrame =
      c.join(o, col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"),
          sum("o_custkey").as("sum_cust"), count(col("o_custkey")).as("cnt_cust"))
    val c0 = Tables.customer(s, d).where(!isDeltaC)
    val o0 = Tables.orders(s, d).where(!isDeltaO)
    val dc = Tables.customer(s, d).where(isDeltaC)
    val dok = Tables.orders(s, d).where(isDeltaO)
    if (!new java.io.File(basePath, "_SUCCESS").exists())
      withRewriteOff(s) {
        aggOf(c0, o0).repartition(1).write.mode("overwrite").parquet(basePath)
      }
    if (!new java.io.File(incrPath, "_SUCCESS").exists())
      withRewriteOff(s) {
        // the three delta terms, aggregated together in ONE pass (the
        // union is the IVM batch), then merged into the base partials
        val deltaAgg = aggOf(dc, o0)
          .unionByName(aggOf(c0, dok))
          .unionByName(aggOf(dc, dok))
          .groupBy("c_mktsegment")
          .agg(sum("n").as("n"), sum("key_checksum").as("key_checksum"),
            sum("sum_cust").as("sum_cust"), sum("cnt_cust").as("cnt_cust"))
        def pack(df: DataFrame, t: String): DataFrame = df.select(
          col("c_mktsegment"), col("n").as(s"n_$t"),
          col("key_checksum").as(s"k_$t"),
          col("sum_cust").as(s"s_$t"), col("cnt_cust").as(s"c_$t"))
        pack(s.read.parquet(basePath), "b")
          .join(pack(deltaAgg, "d"), Seq("c_mktsegment"), "full_outer")
          .select(col("c_mktsegment"),
            (coalesce(col("n_b"), lit(0L)) + coalesce(col("n_d"), lit(0L))).as("n"),
            (coalesce(col("k_b"), lit(0L)) + coalesce(col("k_d"), lit(0L))).as("key_checksum"),
            (coalesce(col("s_b"), lit(0L)) + coalesce(col("s_d"), lit(0L))).as("sum_cust"),
            (coalesce(col("c_b"), lit(0L)) + coalesce(col("c_d"), lit(0L))).as("cnt_cust"))
          .repartition(1).write.mode("overwrite").parquet(incrPath)
      }
    assertAvgRewriteSafe(Tables.customer(s, d).join(Tables.orders(s, d),
      col("c_custkey") === col("o_custkey")), incrPath, "o_custkey")
    import graft.plans.SummaryRewrite._
    registerJoin(sourcePathOf(Tables.customer(s, d)),
      sourcePathOf(Tables.orders(s, d)),
      JoinSummary("c_custkey", "o_custkey",
        SummaryLocation.FixedPath(incrPath), Seq("c_mktsegment"), Map(
          CountStar -> "n", SumCol("o_orderkey") -> "key_checksum",
          SumCol("o_custkey") -> "sum_cust", CountCol("o_custkey") -> "cnt_cust"),
        freshnessProbe(d, "customer", "orders")))
    incrPath
  }

  def summaryJoinIncremental(s: SparkSession, d: String): DataFrame = {
    ensureSegmentOrdersSummaryIncremental(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.customer(s, d).join(Tables.orders(s, d),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"),
        avg("o_custkey").as("avg_cust"))
  }

  /** q251: a FILTERED aggregate over the JOIN-MV — the WHERE lands on
    * the dimension side (Catalyst pushes it below the join), references
    * only the grain column, and therefore keeps or drops whole grain
    * groups of the registered join summary: the rule replays it over
    * the summary rows and answers the global aggregate from what
    * survives. The "revenue for segment X" dashboard query, fact and
    * dimension both untouched.
    */
  def summaryJoinFiltered(s: SparkSession, d: String): DataFrame = {
    ensureSegmentOrdersSummary(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.customer(s, d)
      .where(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"), sum("o_orderkey").as("key_checksum"))
  }

  /** q248: a FILTERED aggregate through the rewrite — WHERE on a grain
    * column (l_returnflag = 'R') with a grouping on the other grain
    * column. The predicate keeps or drops whole (flag, status) groups,
    * so the rule replays it over the summary rows and rolls up what
    * survives: filter + aggregate over a handful of summary rows, fact
    * table untouched. A predicate on a NON-grain column (l_quantity)
    * still declines — pinned in SummaryRewriteSpec.
    */
  def summaryFiltered(s: SparkSession, d: String): DataFrame = {
    ensureLineitemSummary2(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.lineitem(s, d)
      .where(col("l_returnflag") === "R")
      .groupBy("l_linestatus")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        avg("l_partkey").as("avg_part"))
  }

  /** q246: grain ROLL-UP through the rewrite — the query groups by
    * l_returnflag only, which no flag-grain summary can answer (the
    * measures include AVG(l_partkey) and COUNT(DISTINCT l_linestatus),
    * which the flag-grain summary doesn't carry), so the rule
    * re-aggregates the (flag, status)-grain summary: counts and sums
    * roll up by summing, AVG divides the rolled-up sum/count pair, and
    * the distinct-status count is exactly the grain column's distinct
    * values among the group's summary rows. The plan keeps an
    * Aggregate — but over the |flag × status|-row summary, not the
    * fact table (pinned in SummaryRewriteSpec); the oracle recomputes
    * everything from lineitem.
    */
  def summaryRollup(s: SparkSession, d: String): DataFrame = {
    ensureLineitemSummary2(s, d): Unit
    graft.plans.SummaryRewrite.install(s)
    s.conf.set(graft.plans.SummaryRewrite.EnabledKey, "true")
    Tables.lineitem(s, d).groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum("l_orderkey").as("key_checksum"),
        avg("l_partkey").as("avg_part"),
        countDistinct(col("l_linestatus")).as("n_status"))
  }

  /** Benchmark warmup hook: materialize every derived copy a registered
    * query reads (partitioned/bucketed tables, the V2-source TSV, the
    * ORC copy), so measured runs see only the query itself.
    */
  def warmDerived(s: SparkSession, d: String): Unit = {
    ensurePartitionedOrders(s, d): Unit
    ensureBucketedTables(s, d): Unit
    ensureLineitemSummary(s, d): Unit
    ensureLineitemSummary2(s, d): Unit
    ensureLineitemSummaryIncremental(s, d): Unit
    ensureLineitemSummaryDeletes(s, d): Unit
    ensureSegmentOrdersSummary(s, d): Unit
    ensureSegmentOrdersSummaryIncremental(s, d): Unit
    ensureSegmentOrdersSummaryDeletes(s, d): Unit
    ensureLineitemSegmentSummary(s, d): Unit
    ensureLineitemSegmentSummaryIncremental(s, d): Unit
    ensureLineitemSegmentSummaryDeletes(s, d): Unit
    ensureCompositeJoinSummary(s, d): Unit
    ensureCompositeJoinSummaryIncremental(s, d): Unit
    ensureCompositeJoinSummaryDeletes(s, d): Unit
    ensureSnowflakeSummary(s, d): Unit
    ensureSnowflakeSummaryIncremental(s, d): Unit
    ensureSnowflakeSummaryDeletes(s, d): Unit
    ensureJoinKeyStats(s, d): Unit
    ensureNationStats(s, d): Unit
    graft.dedup.DedupQueries.ensureShingleIndex(s, d): Unit
    graft.dedup.DedupQueries.ensureCompactedShingleIndex(s, d): Unit
    graft.sim.SimQueries.ensureIvfIndex(s, d): Unit
    graft.sim.SimQueries.ensureCompactedIvfIndex(s, d): Unit
    graft.dedup.DedupQueries.ensureNearDupPairs(s, d): Unit
    graft.dedup.DedupQueries.ensureIngestPairs(s, d): Unit
    graft.dedup.DedupQueries.ensureClusters(s, d): Unit
    graft.dedup.DedupQueries.ensureOldClusters(s, d): Unit
    GraphQueries.ensureEdges(s, d): Unit
    GraphQueries.ensurePagerankEdges(s, d): Unit
    graft.streaming.Streams.ensureUpsertSource(s, d): Unit
    graft.streaming.Streams.ensureUpsertSnapshot(s, d): Unit
    graft.streaming.Streams.ensureOrdersFeed(s, d): Unit
    graft.streaming.Streams.ensureSegmentStreamSummary(s, d): Unit
    graft.multimodal.Multimodal.ensureFrameEvidence(s, d): Unit
    graft.multimodal.Multimodal.ensureOldFrameIndex(s, d): Unit
    graft.multimodal.Multimodal.ensureCompactedFrameIndex(s, d): Unit
    graft.multimodal.Multimodal.ensureErasureCompactedFrameIndex(s, d): Unit
    graft.multimodal.Multimodal.ensureShotKeyframes(s, d): Unit
    AnalyticsQueries.ensureBaskets(s, d): Unit
    graft.streaming.Streams.ensureLineitemFeed(s, d): Unit
    graft.streaming.Streams.ensureChainStreamSummary(s, d): Unit
    graft.streaming.Streams.ensureOrdersCdcFeed(s, d): Unit
    graft.streaming.Streams.ensureCdcStreamSummary(s, d): Unit
    graft.streaming.Streams.ensureSessionFeed(s, d): Unit
    graft.streaming.Streams.ensureSessionStreamSnapshot(s, d): Unit
    graft.streaming.Streams.ensureSnowflakeStreamSummary(s, d): Unit
    graft.streaming.Streams.ensureCompositeFeed(s, d): Unit
    graft.streaming.Streams.ensureCompositeStreamSummary(s, d): Unit
    graft.streaming.Streams.ensureDocsFeed(s, d): Unit
    graft.streaming.Streams.ensureShingleStreamIndex(s, d): Unit
    graft.streaming.Streams.ensureEmbeddingsFeed(s, d): Unit
    graft.streaming.Streams.ensureIvfStreamIndex(s, d): Unit
    graft.streaming.Streams.ensureFoldedShingleStreamIndex(s, d): Unit
    graft.streaming.Streams.ensureContendedShingleIndex(s, d): Unit
    graft.streaming.Streams.ensureDecontamStream(s, d): Unit
    graft.streaming.Streams.ensureFoldedIvfStreamIndex(s, d): Unit
    graft.multimodal.Multimodal.ensureFrameStreamIndex(s, d): Unit
    graft.streaming.Streams.ensureFoldedSessionStreamSnapshot(s, d): Unit
    graft.sim.SimQueries.ensureRetrainedIvfIndex(s, d): Unit
    ExtraQueries.warmDerived(s, d)
  }

  /** 16-bit-per-dimension Morton (Z-order) code: interleave the low 16
    * bits of `a` (even positions) and `b` (odd positions) with the
    * classic spread-bits ladder — pure 32-bit integer expressions, so it
    * codegens on Spark and replays exactly in any engine. Sorting or
    * range-partitioning a table by this code places rows close in BOTH
    * dimensions into the same files/row groups, which is what turns
    * 2-dimensional box predicates into file-level skipping at 100 TB
    * (a single-column sort order can only tighten min/max stats for its
    * leading column; Z-order tightens both at once).
    */
  def morton(a: Column, b: Column): Column = {
    def spread(x: Column): Column = {
      val m = x.bitwiseAND(lit(0xFFFF))
      val s1 = m.bitwiseOR(shiftleft(m, 8)).bitwiseAND(lit(0x00FF00FF))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(0x0F0F0F0F))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(0x33333333))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(0x55555555))
    }
    // widen BEFORE the final shift: 0x55555555 << 1 overflows int32
    // (Spark would wrap silently, DuckDB would raise — neither is the
    // 32-bit Morton code)
    spread(a).cast("long").bitwiseOR(shiftleft(spread(b).cast("long"), 1))
  }

  /** q104: Z-order locality audit over (l_partkey, l_suppkey). Each key
    * is min/max-normalized into the 16-bit Morton domain with scalar
    * subqueries (in-plan, integer-exact — no driver state), rows are
    * Morton-coded, cut into 256 Z-ranges (the files a
    * `repartitionByRange(zvalue)` write would produce), and each range
    * reports its per-dimension min/max span. The payoff the numbers
    * prove: every Z-range bounds BOTH key dimensions at ~1/16 of their
    * domain (√256), so a box predicate on either or both keys prunes
    * ~255/256 of such files by footer stats alone — versus a
    * single-column sort where the second dimension's span per file stays
    * the full domain. Exact integer arithmetic end to end, so the whole
    * mechanic is oracle-gated like q59–q61.
    */
  def zorderBuckets(s: SparkSession, d: String): DataFrame = {
    // Unique per-call view name, dropped after eager analysis — shared
    // session state must not collide across concurrent queries.
    val v = "li_z_" + java.util.UUID.randomUUID().toString.replace("-", "")
    Tables.lineitem(s, d).createOrReplaceTempView(v)
    val base = s.sql(
      s"""SELECT CAST(l_partkey AS BIGINT) pk, CAST(l_suppkey AS BIGINT) sk,
        |  (SELECT min(l_partkey) FROM $v) pk_min,
        |  (SELECT max(l_partkey) FROM $v) pk_max,
        |  (SELECT min(l_suppkey) FROM $v) sk_min,
        |  (SELECT max(l_suppkey) FROM $v) sk_max
        |FROM $v""".stripMargin)
    s.catalog.dropTempView(v)
    base
      .withColumn("pk16",
        expr("CAST((pk - pk_min) * 65535 div greatest(pk_max - pk_min, 1) AS INT)"))
      .withColumn("sk16",
        expr("CAST((sk - sk_min) * 65535 div greatest(sk_max - sk_min, 1) AS INT)"))
      .withColumn("z", morton(col("pk16"), col("sk16")))
      .groupBy(expr("z div 16777216").as("zrange")) // 2^24: 256 ranges over 2^32
      .agg(count(lit(1)).as("n"),
        min("pk").as("pk_lo"), max("pk").as("pk_hi"),
        min("sk").as("sk_lo"), max("sk").as("sk_hi"))
  }

  /** Registry forms of the scale techniques, each with an exact oracle:
    * the salted aggregate must equal the plain group-by, the pruned scan
    * must equal the predicate form, the bucketed (shuffle-free) join must
    * equal the plain join, the Z-order ranges must bound both dimensions
    * — so the 100 TB mechanics are themselves correctness-gated, not
    * just plan-pinned in ScaleSpec.
    */
  /** Skew-salted equi JOIN — q59's mechanic applied to a join instead of
    * an aggregate. A hot fact key turns sort-merge/hash join into one
    * straggler task; salting spreads it: the fact side draws a uniform
    * salt in [0, salts), the dimension side replicates each row once per
    * salt (`explode(sequence(...))`), and the join runs on
    * `(key, salt)` — the hot key's probe rows now land on `salts` tasks.
    * Replication multiplies the dimension shuffle by `salts`, which is
    * the right trade exactly when the dimension is orders of magnitude
    * smaller than the skewed fact table (here: orders vs lineitem).
    * AQE's skew-join split (pinned in ScaleSpec) is the runtime cousin;
    * explicit salting is the plan-level form that also works where AQE
    * can't see the skew (first shuffle, streaming joins).
    *
    * The aggregate after the join makes the result salt-independent, so
    * the whole mechanic is oracle-checked against the plain join.
    */
  def saltedJoin(s: SparkSession, d: String, salts: Int = 8): DataFrame = {
    val fact = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
        col("l_quantity").cast("decimal(18,2)").as("qty"),
        pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts)).as("_salt"))
    val dim = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    // shuffle_hash hint: at test scale the replicated dim would still
    // broadcast, and a broadcast join has no shuffle skew to spread —
    // the hint pins the shuffled regime salting exists for (at 100 TB
    // the dim wouldn't broadcast in the first place)
    fact.join(dim.hint("shuffle_hash"),
        fact("l_orderkey") === dim("o_orderkey") && fact("_salt") === dim("_salt"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum("qty").cast("double").as("total_qty"))
  }

  /** One-time materialization of the lineitem join-key statistics the
    * q274 plan chooser CONSUMES: one row of (n_keys, n_rows, max_freq)
    * over the l_orderkey domain — the aggregate the q207 skew histogram
    * feeds a planner. Persisted like any derived artifact so the choice
    * reads a file stat at plan-build time instead of re-scanning the
    * fact table to decide how to scan the fact table.
    */
  private val keyStatsLock = new Object

  def ensureJoinKeyStats(s: SparkSession, d: String): String = keyStatsLock.synchronized {
    val path = s"${Tables.scratchDir}/graft-keystats-${Tables.datasetTag(d, "lineitem")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      withRewriteOff(s) {
        writeKeyStats(Tables.lineitem(s, d), "l_orderkey", path)
      }
    path
  }

  /** Compute + persist the key-frequency stats for a fact relation:
    * one row (n_keys, n_rows, max_freq) — the minimum a salted-vs-plain
    * decision needs.
    */
  private[graft] def writeKeyStats(fact: DataFrame, key: String, path: String): Unit =
    fact.groupBy(col(key)).agg(count(lit(1)).as("freq"))
      .agg(count(lit(1)).as("n_keys"), sum("freq").as("n_rows"),
        max("freq").as("max_freq"))
      .repartition(1)
      .write.mode("overwrite").parquet(path)

  /** A hot key is one that would make a single post-shuffle task carry
    * at least this many times the MEAN key's rows — below it, salting's
    * dimension replication costs more than the straggler it prevents.
    */
  private[graft] val SkewRatioThreshold = 16L

  /** Statistics-CONSUMING equi-join: reads the persisted key stats and
    * picks the physical shape at plan-build time — q131's salted join
    * when the measured max/mean key-frequency ratio says one reduce
    * task would straggle, the plain shuffled join otherwise. Both
    * branches are semantically identical (salting only redistributes
    * rows), so one oracle covers whichever branch the data demands;
    * ScaleSpec pins that a constructed hot-key fixture fires the salted
    * branch and a uniform fixture fires the plain one. This is the
    * missing half of the q207/q198 diagnostics: the engine acting on
    * its OWN statistics instead of printing them — at 100 TB the
    * difference between q131's salting being applied where it's needed
    * and paying its replication where it isn't.
    */
  private[graft] def statsChosenEquiJoin(s: SparkSession, statsPath: String,
      fact: DataFrame, factKey: String, saltCols: Seq[String],
      dim: DataFrame, dimKey: String, salts: Int = 8): DataFrame = {
    // the output select below resolves columns by bare name and the
    // salted branch injects _salt on both sides — overlapping schemas
    // would make the select ambiguous (or silently clobber a caller's
    // _salt), so demand disjointness up front like SummaryRewrite's
    // disjoint-schema guard
    val overlap = fact.columns.toSet intersect dim.columns.toSet
    require(overlap.isEmpty,
      s"statsChosenEquiJoin: fact and dim schemas must be disjoint, " +
        s"both carry ${overlap.mkString(", ")}")
    require(!fact.columns.contains("_salt") && !dim.columns.contains("_salt"),
      "statsChosenEquiJoin: _salt is reserved for the salted branch")
    val st = s.read.parquet(statsPath).head()
    val nKeys = st.getAs[Long]("n_keys")
    val nRows = st.getAs[Long]("n_rows")
    val maxFreq = st.getAs[Long]("max_freq")
    val meanFreq = math.max(1L, nRows / math.max(1L, nKeys))
    val outCols = (fact.columns ++ dim.columns).map(col).toSeq
    if (maxFreq >= SkewRatioThreshold * meanFreq) {
      // salted branch: q131's mechanic — deterministic fact-row salt
      // drawn from CALLER-NAMED discriminator columns (q131 uses
      // (l_orderkey, l_linenumber)): salting by whatever columns happen
      // to be projected lets a hot key whose rows are duplicates hash
      // to ONE salt and keep its straggler while still paying the
      // dimension replication — the discriminator must vary within the
      // hot key; dimension replicated once per salt, shuffled join on
      // (key, salt)
      val f = fact.withColumn("_salt",
        pmod(xxhash64(saltCols.map(col): _*), lit(salts.toLong)))
      val dm = dim.withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
      f.join(dm.hint("shuffle_hash"),
          f(factKey) === dm(dimKey) && f("_salt") === dm("_salt"))
        .select(outCols: _*)
    } else {
      fact.join(dim, fact(factKey) === dim(dimKey)).select(outCols: _*)
    }
  }

  /** q274: the stats-chosen join applied to lineitem ⋈ orders — on
    * this corpus the measured max l_orderkey frequency is the order
    * line cap (7) against a mean of ~4, far under the 16× straggler
    * bound, so the PLAIN branch serves (pinned: no salt explode in the
    * plan); the hot-key fixture in ScaleSpec drives the same code down
    * the salted branch. Output is the salt-independent priority
    * aggregate, so the oracle (plain join recompute) gates either
    * branch.
    */
  def statsAdaptiveJoin(s: SparkSession, d: String): DataFrame = {
    val stats = ensureJoinKeyStats(s, d)
    val fact = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity").cast("decimal(18,2)").as("qty"))
    val dim = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
    statsChosenEquiJoin(s, stats, fact, "l_orderkey",
        Seq("l_orderkey", "l_linenumber"), dim, "o_orderkey")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum("qty").cast("double").as("total_qty"))
  }

  /** Compute + persist the dimension-size statistics the q285 plan
    * chooser consumes: one row of (n_rows, est_bytes), where est_bytes
    * is the summed string-rendered width of every column plus a fixed
    * per-field overhead — the order-of-magnitude a broadcast budget
    * needs (Spark's own sizeInBytes estimate is the same class of
    * approximation), measured from the data instead of guessed.
    *
    * LIMITS of the string-width proxy: it tracks the in-memory hash
    * table well for scalar columns, but a column that renders compactly
    * relative to its heap footprint — binary blobs, float arrays, deep
    * structs — can undercount the true broadcast cost badly. The
    * per-field `+8` floor bounds the error for narrow renders (a NULL
    * or empty string still pays object overhead), and the q285 caller
    * passes a scalar dim; a future caller with array/binary columns
    * should widen the proxy (e.g. octet_length for binary) before
    * trusting the budget decision.
    */
  private[graft] def writeDimStats(dim: DataFrame, path: String): Unit = {
    val rowBytes = dim.columns.map(c =>
        coalesce(length(col(c).cast("string")).cast("long"), lit(0L)) + lit(8L))
      .reduce(_ + _)
    dim.select(rowBytes.as("b"))
      .agg(count(lit(1)).as("n_rows"), sum("b").as("est_bytes"))
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Spark's own autoBroadcastJoinThreshold default (10 MB): below it a
    * replicated hash table is cheaper than shuffling the fact side;
    * above it executor memory and driver fan-out make the shuffle the
    * safe shape.
    */
  private[graft] val BroadcastBytesBudget = 10L << 20

  /** Statistics-CONSUMING broadcast-vs-shuffle equi-join — q274's
    * sibling for the OTHER ubiquitous physical-join decision: reads the
    * persisted dimension stats and picks `broadcast(dim)` when the
    * measured size fits the budget, the shuffled sort-merge join when
    * it doesn't (the merge hint keeps Spark's own row-count guess from
    * silently re-broadcasting what the MEASURED stats said not to —
    * this operator acts on its statistics, not the optimizer's
    * estimate). Both branches are semantically identical, so one oracle
    * covers whichever branch the data demands; ScaleSpec drives both
    * (an inflated-dim fixture forces the shuffle).
    */
  private[graft] def statsChosenBroadcastJoin(s: SparkSession, statsPath: String,
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      budgetBytes: Long = BroadcastBytesBudget): DataFrame = {
    val overlap = fact.columns.toSet intersect dim.columns.toSet
    require(overlap.isEmpty,
      s"statsChosenBroadcastJoin: fact and dim schemas must be disjoint, " +
        s"both carry ${overlap.mkString(", ")}")
    val st = s.read.parquet(statsPath).head()
    // sum(b) over an empty dim persists NULL — an empty dimension
    // trivially broadcasts (0 bytes), it must not NPE the chooser
    val estBytes = if (st.isNullAt(st.fieldIndex("est_bytes"))) 0L
      else st.getAs[Long]("est_bytes")
    if (estBytes <= budgetBytes)
      fact.join(broadcast(dim), fact(factKey) === dim(dimKey))
    else
      fact.join(dim.hint("merge"), fact(factKey) === dim(dimKey))
  }

  /** One-time materialization of the nation-dimension size stats the
    * q285 chooser consumes — the dimension side of the decision, next
    * to [[ensureJoinKeyStats]]'s fact-side skew stats.
    */
  private val dimStatsLock = new Object

  def ensureNationStats(s: SparkSession, d: String): String = dimStatsLock.synchronized {
    val path = s"${Tables.scratchDir}/graft-dimstats-${Tables.datasetTag(d, "nation")}"
    if (!new java.io.File(path, "_SUCCESS").exists())
      withRewriteOff(s) {
        writeDimStats(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name")), path)
      }
    path
  }

  /** q285: the stats-chosen broadcast applied to customer ⋈ nation —
    * the measured 25-row dimension sits far under the 10 MB budget, so
    * the BROADCAST branch serves (pinned: BroadcastHashJoin in the
    * plan); ScaleSpec's inflated-dim fixture drives the same code down
    * the shuffled sort-merge branch and proves both branches
    * value-equal. Output is branch-independent, so the plain-join
    * oracle gates either. This closes the q274 pair: the engine now
    * acts on BOTH measured join statistics — fact-side key skew
    * (salt-or-not) and dim-side size (broadcast-or-shuffle).
    */
  def statsBroadcastJoin(s: SparkSession, d: String): DataFrame = {
    val stats = ensureNationStats(s, d)
    val fact = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val dim = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    statsChosenBroadcastJoin(s, stats, fact, "c_nationkey", dim, "n_nationkey")
      .groupBy("n_name")
      .agg(count(lit(1)).as("n_cust"), sum("c_custkey").as("key_checksum"))
  }

  /** Small-file compaction planner — the table-maintenance step every
    * large lake runs continuously: pack files (here: `documents` rows as
    * the file inventory, `n_chars` as bytes) into ~target-size output
    * groups, sequentially in key order. bin = start-offset div target
    * over a per-source cumulative sum — one window plus one aggregate,
    * no driver-side loop, and the plan output is #bins-sized rather than
    * #files-sized, so planning 100 M files is still one distributed
    * pass. (First-fit-decreasing packs marginally tighter but its bins
    * depend on global order; offset binning is deterministic, locality-
    * preserving, and stable under appends — which is why production
    * compactors use it.)
    */
  def compactionPlan(s: SparkSession, d: String, target: Long = 2048L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Tables.documents(s, d)
      .withColumn("end_off", sum("n_chars").over(w))
      .withColumn("bin", expr(s"(end_off - n_chars) div $target"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_files"), sum("n_chars").as("bytes"),
        min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
  }

  /** Hand-built Bloom-semi-join pushdown: build a Bloom filter over the
    * join keys of the small filtered dimension (~1% of orders), probe it
    * in the fact scan BEFORE the join's shuffle, then run the exact equi
    * join to discard the false positives. This is the rewrite Spark's
    * own `InjectRuntimeFilter` performs when its size thresholds fire —
    * written out explicitly (via the same Catalyst `BloomFilterAggregate`
    * / `BloomFilterMightContain` expressions, surfaced by
    * [[graft.functions.GraftFunctions]]) so it also applies where the
    * optimizer can't see it: thresholds tuned for clusters, streaming
    * joins, or a probe side behind a non-join operator.
    *
    * Scale shape: the ~1.5k-key dimension aggregates into ONE ~1 MB
    * bloom bitmap shipped as a scalar-subquery broadcast; at 100 TB the
    * probe drops ~99% of fact rows at the scan, so the join exchange
    * shuffles 1% of the bytes the plain plan would. The final join makes
    * the result exact, so the whole mechanic is oracle-gated against the
    * plain join (same pattern as q59/q131's salting).
    */
  def bloomJoin(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    val sfx = java.util.UUID.randomUUID().toString.replace("-", "")
    val (vo, vl) = ("ord_bf_" + sfx, "li_bf_" + sfx)
    Tables.orders(s, d).createOrReplaceTempView(vo)
    Tables.lineitem(s, d).createOrReplaceTempView(vl)
    val df = s.sql(
      s"""WITH dim AS (
        |  SELECT o_orderkey, o_orderpriority FROM $vo
        |  WHERE o_totalprice > 494000),
        |pre AS (
        |  SELECT l_orderkey, l_quantity FROM $vl
        |  WHERE bloom_might_contain(
        |    (SELECT bloom_agg(xxhash64(o_orderkey)) FROM dim),
        |    xxhash64(l_orderkey)))
        |SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
        |FROM pre JOIN dim ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin)
    s.catalog.dropTempView(vo)
    s.catalog.dropTempView(vl)
    df
  }

  /** Zone-map (min/max data-skipping) audit: bucket the event stream
    * into day "zones" — the granularity a time-ordered ingest lays files
    * out at — compute each zone's min/max timestamp statistics, and
    * classify every zone against a query predicate
    * (`ts ∈ [Jan 10 12:00, Jan 20 06:00)`) as `skip` (no row can
    * match — the scan never opens it), `full` (every row matches — the
    * predicate needn't even be evaluated), or `partial` (boundary zones
    * that need the row-level filter). Output per class: zone count and
    * row count — exactly the scan-pruning arithmetic a 100 TB engine
    * does with parquet row-group stats, surfaced as a query so the
    * skipping benefit is measurable per predicate.
    *
    * Scale shape: one partial+final hash aggregate to |zones| rows; the
    * classification is a projection over that tiny table. All bounds
    * are exact epoch microseconds on both engines.
    */
  def zoneMapAudit(s: SparkSession, d: String): DataFrame = {
    val lo = "unix_micros(timestamp'2024-01-10 12:00:00')"
    val hi = "unix_micros(timestamp'2024-01-20 06:00:00')"
    Tables.events(s, d)
      .select(unix_micros(col("ts")).as("t_us"))
      .withColumn("zone", expr("t_us div 86400000000L"))
      .groupBy("zone")
      .agg(count(lit(1)).as("n_rows"),
        min("t_us").as("zmin"), max("t_us").as("zmax"))
      .withColumn("cls",
        when(expr(s"zmax < $lo OR zmin >= $hi"), "skip")
          .when(expr(s"zmin >= $lo AND zmax < $hi"), "full")
          .otherwise("partial"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_zones"), sum("n_rows").as("n_rows"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q198_zonemap_audit" -> (zoneMapAudit(_, _)),
    "q240_summary_rewrite" -> (summaryAggregate(_, _)),
    "q241_summary_rewrite_multi" -> (summaryAggregateAvg(_, _)),
    "q242_summary_incremental" -> (summaryAggregateIncremental(_, _)),
    "q255_summary_delete_ivm" -> (summaryAggregateDeletes(_, _)),
    "q246_summary_rollup" -> (summaryRollup(_, _)),
    "q247_summary_global" -> (summaryGlobal(_, _)),
    "q248_summary_filtered" -> (summaryFiltered(_, _)),
    "q250_summary_join" -> (summaryJoinAggregate(_, _)),
    "q273_summary_composite_join" -> (summaryCompositeJoin(_, _)),
    "q281_summary_composite_incremental" -> (summaryCompositeIncremental(_, _)),
    "q282_summary_composite_delete_ivm" -> (summaryCompositeDeletes(_, _)),
    "q283_summary_snowflake_incremental" -> (summarySnowflakeIncremental(_, _)),
    "q284_summary_snowflake_delete_ivm" -> (summarySnowflakeDeletes(_, _)),
    "q256_summary_chain" -> (summaryChainAggregate(_, _)),
    "q276_summary_snowflake" -> (summarySnowflakeAggregate(_, _)),
    "q258_summary_chain_incremental" -> (summaryChainIncremental(_, _)),
    "q262_summary_chain_delete_ivm" -> (summaryChainDeletes(_, _)),
    "q259_summary_join_delete_ivm" -> (summaryJoinDeletes(_, _)),
    "q251_summary_join_filtered" -> (summaryJoinFiltered(_, _)),
    "q252_summary_join_incremental" -> (summaryJoinIncremental(_, _)),
    "q189_bloom_join" -> (bloomJoin(_, _)),
    "q151_compaction_plan" -> (compactionPlan(_, _)),
    "q59_salted_sum" -> ((s, d) =>
      saltedSum(Tables.lineitem(s, d), col("l_returnflag"), col("l_quantity"))),
    "q60_partition_pruned" -> (partitionPrunedScan(_, _)),
    "q61_bucketed_join" -> (bucketedJoin(_, _)),
    "q104_zorder" -> (zorderBuckets(_, _)),
    "q131_salted_join" -> (saltedJoin(_, _)),
    "q274_stats_adaptive_join" -> (statsAdaptiveJoin(_, _)),
    "q285_stats_broadcast_join" -> (statsBroadcastJoin(_, _)))

  val oracles: Map[String, String] = Map(
    // the rewrite must be answer-preserving: the oracle recomputes the
    // aggregate from the FACT table the rewritten plan never scans
    "q240_summary_rewrite" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  min(l_partkey) AS min_part, max(l_partkey) AS max_part
        |FROM lineitem GROUP BY 1""".stripMargin,
    // AVG recomputed as exact-integer-sum ÷ count in double arithmetic —
    // the same value Spark's Average produces for integral inputs (the
    // summed longs stay below 2^53, so the double sum is exact)
    "q241_summary_rewrite_multi" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(l_partkey) AS DOUBLE) / count(*) AS avg_part
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    // the incrementally-refreshed join summary must land exactly where
    // the full recompute lands: same oracle shape as q250
    "q252_summary_join_incremental" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(o_custkey) AS DOUBLE) / count(o_custkey) AS avg_cust
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    "q251_summary_join_filtered" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_checksum
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
        |GROUP BY 1""".stripMargin,
    // the chain-MV must be answer-preserving: the oracle recomputes the
    // full 3-way inner equi-join + aggregate from the base tables the
    // rewritten plan never scans
    "q256_summary_chain" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(l_partkey) AS DOUBLE) / count(l_partkey) AS avg_part
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    // the incrementally-refreshed chain summary must land exactly where
    // the full recompute lands: same 3-way oracle as q256
    "q258_summary_chain_incremental" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(l_partkey) AS DOUBLE) / count(l_partkey) AS avg_part
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    // the delete-bearing chain refresh: all-additive measures, pure
    // signed merge — must land exactly on the full 3-way recompute
    "q262_summary_chain_delete_ivm" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(l_partkey) AS DOUBLE) / count(l_partkey) AS avg_part
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,
    // the delete-bearing join-MV refresh must land exactly on the full
    // join recompute (min/max repaired, signed sums subtracted)
    "q259_summary_join_delete_ivm" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
        |  min(o_custkey) AS min_cust, max(o_custkey) AS max_cust
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    // the join-MV must be answer-preserving: the oracle recomputes the
    // inner equi-join + aggregate from BOTH base tables the rewritten
    // snowflake recomputed from the three base tables
    "q276_summary_snowflake" ->
      """SELECT o_orderpriority, p_type, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(p_size) AS BIGINT) AS sum_size
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2""".stripMargin,
    // composite-key MV recomputed from scratch: the bridge derivation
    // inlined as a CTE over lineitem, then the two-column equi-join
    "q273_summary_composite_join" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    count(*) AS ps_cnt
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(ps_cnt) AS BIGINT) AS sum_pscnt
        |FROM lineitem JOIN ps
        |  ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |GROUP BY 1, 2""".stripMargin,
    // the incrementally-refreshed and delete-refreshed composite
    // summaries must land exactly where the full recompute lands: same
    // oracle as q273
    "q281_summary_composite_incremental" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    count(*) AS ps_cnt
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(ps_cnt) AS BIGINT) AS sum_pscnt
        |FROM lineitem JOIN ps
        |  ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |GROUP BY 1, 2""".stripMargin,
    "q282_summary_composite_delete_ivm" ->
      """WITH ps AS (
        |  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
        |    count(*) AS ps_cnt
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(ps_cnt) AS BIGINT) AS sum_pscnt
        |FROM lineitem JOIN ps
        |  ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
        |GROUP BY 1, 2""".stripMargin,
    // the refreshed snowflake summaries must land exactly where the
    // full recompute lands: same oracle as q276
    "q283_summary_snowflake_incremental" ->
      """SELECT o_orderpriority, p_type, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(p_size) AS BIGINT) AS sum_size
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2""".stripMargin,
    "q284_summary_snowflake_delete_ivm" ->
      """SELECT o_orderpriority, p_type, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(p_size) AS BIGINT) AS sum_size
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN part ON l_partkey = p_partkey
        |GROUP BY 1, 2""".stripMargin,
    // plan never scans; AVG as exact-integer-sum ÷ non-null count
    "q250_summary_join" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(o_custkey) AS DOUBLE) / count(o_custkey) AS avg_cust
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    "q248_summary_filtered" ->
      """SELECT l_linestatus, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(l_partkey) AS DOUBLE) / count(*) AS avg_part
        |FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1""".stripMargin,
    "q247_summary_global" ->
      """SELECT count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(l_partkey) AS DOUBLE) / count(*) AS avg_part,
        |  CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_status
        |FROM lineitem""".stripMargin,
    // roll-up recomputed from the fact table: exact-integer AVG
    // division as in q241; countDistinct is BIGINT on both sides
    "q246_summary_rollup" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  CAST(sum(l_partkey) AS DOUBLE) / count(*) AS avg_part,
        |  CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_status
        |FROM lineitem GROUP BY 1""".stripMargin,
    // the incremental path must land EXACTLY where the full recompute
    // lands: same oracle as q240, fact-table recompute
    "q242_summary_incremental" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  min(l_partkey) AS min_part, max(l_partkey) AS max_part
        |FROM lineitem GROUP BY 1""".stripMargin,
    // the delete-bearing refresh must also land exactly on the full
    // recompute: same fact-table oracle as q240/q242
    "q255_summary_delete_ivm" ->
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(l_orderkey) AS BIGINT) AS key_checksum,
        |  min(l_partkey) AS min_part, max(l_partkey) AS max_part
        |FROM lineitem GROUP BY 1""".stripMargin,
    "q198_zonemap_audit" ->
      """WITH z AS (
        |  SELECT epoch_us(ts) // 86400000000 AS zone,
        |    count(*) AS n_rows,
        |    min(epoch_us(ts)) AS zmin, max(epoch_us(ts)) AS zmax
        |  FROM events GROUP BY 1),
        |c AS (
        |  SELECT CASE
        |    WHEN zmax < epoch_us(TIMESTAMP '2024-01-10 12:00:00')
        |      OR zmin >= epoch_us(TIMESTAMP '2024-01-20 06:00:00') THEN 'skip'
        |    WHEN zmin >= epoch_us(TIMESTAMP '2024-01-10 12:00:00')
        |      AND zmax < epoch_us(TIMESTAMP '2024-01-20 06:00:00') THEN 'full'
        |    ELSE 'partial' END AS cls, n_rows
        |  FROM z)
        |SELECT cls, count(*) AS n_zones, CAST(sum(n_rows) AS BIGINT) AS n_rows
        |FROM c GROUP BY cls""".stripMargin,
    // the plain join the bloom-pushdown plan must equal exactly (the
    // final equi join removes every bloom false positive)
    "q189_bloom_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
        |    AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_totalprice > 494000
        |GROUP BY o_orderpriority""".stripMargin,
    "q151_compaction_plan" ->
      """WITH t AS (
        |  SELECT source, doc_id, n_chars,
        |    sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
        |  FROM documents)
        |SELECT source, CAST((end_off - n_chars) // 2048 AS BIGINT) AS bin,
        |  count(*) AS n_files, CAST(sum(n_chars) AS BIGINT) AS bytes,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM t GROUP BY 1, 2""".stripMargin,
    // the plain join the salted plan must equal
    "q131_salted_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
        |    AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    // the plain-join recompute gates WHICHEVER branch the measured
    // stats picked — salting only redistributes rows
    "q274_stats_adaptive_join" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
        |    AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin,
    // the plain-join recompute gates WHICHEVER branch the measured dim
    // stats picked — broadcast vs shuffle only moves rows
    "q285_stats_broadcast_join" ->
      """SELECT n_name, count(*) AS n_cust,
        |  CAST(sum(c_custkey) AS BIGINT) AS key_checksum
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY 1""".stripMargin,
    "q59_salted_sum" ->
      """SELECT l_returnflag AS k,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q60_partition_pruned" ->
      """SELECT o_orderstatus, count(*) AS cnt
        |FROM orders WHERE year(o_orderdate) = 1997
        |GROUP BY o_orderstatus""".stripMargin,
    "q61_bucketed_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    // the same normalization + spread-bits ladder, staged per step; the
    // final shift is widened to BIGINT exactly as the Spark side widens
    // to long
    "q104_zorder" ->
      """WITH base AS (
        |  SELECT CAST(l_partkey AS BIGINT) pk, CAST(l_suppkey AS BIGINT) sk,
        |    (SELECT min(l_partkey) FROM lineitem) pk_min,
        |    (SELECT max(l_partkey) FROM lineitem) pk_max,
        |    (SELECT min(l_suppkey) FROM lineitem) sk_min,
        |    (SELECT max(l_suppkey) FROM lineitem) sk_max
        |  FROM lineitem),
        |k AS (
        |  SELECT pk, sk,
        |    CAST((pk - pk_min) * 65535 // greatest(pk_max - pk_min, 1) AS INT) pk16,
        |    CAST((sk - sk_min) * 65535 // greatest(sk_max - sk_min, 1) AS INT) sk16
        |  FROM base),
        |m AS (SELECT pk, sk, pk16 & 65535 AS pm, sk16 & 65535 AS sm FROM k),
        |a AS (SELECT pk, sk, (pm | (pm << 8)) & 16711935 AS p1,
        |             (sm | (sm << 8)) & 16711935 AS s1 FROM m),
        |b AS (SELECT pk, sk, (p1 | (p1 << 4)) & 252645135 AS p2,
        |             (s1 | (s1 << 4)) & 252645135 AS s2 FROM a),
        |c AS (SELECT pk, sk, (p2 | (p2 << 2)) & 858993459 AS p3,
        |             (s2 | (s2 << 2)) & 858993459 AS s3 FROM b),
        |e AS (SELECT pk, sk,
        |        CAST((p3 | (p3 << 1)) & 1431655765 AS BIGINT) AS p4,
        |        CAST((s3 | (s3 << 1)) & 1431655765 AS BIGINT) AS s4 FROM c)
        |SELECT (p4 | (s4 << 1)) // 16777216 AS zrange, count(*) AS n,
        |  min(pk) AS pk_lo, max(pk) AS pk_hi,
        |  min(sk) AS sk_lo, max(sk) AS sk_hi
        |FROM e GROUP BY 1""".stripMargin)
}
