package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Table-maintenance operators — the mechanics that keep a 100 TB
  * warehouse current without recomputing it: incremental (partial-merge)
  * aggregate maintenance, snapshot diffing, and schema-evolution reads.
  *
  * The reference recomputes everything per job
  * (`MapReduceFramework.cpp:191-202` has no notion of prior state);
  * these queries show the Spark-native upgrade paths, each exactly
  * checkable against a full recompute — the invariant that MAKES
  * incremental maintenance trustworthy.
  */
object SnapshotQueries {
  type Q = (SparkSession, String) => DataFrame

  private def cents(c: String) =
    (col(c).cast("decimal(18,2)") * 100).cast("long")

  /** Incremental aggregate maintenance: a materialized per-priority
    * aggregate is kept as MERGEABLE partials (count + decimal sum), so
    * refreshing with a new epoch is `union → re-aggregate` over a
    * handful of partial rows — never a rescan of history. The query
    * computes base partials (orders before 1997), delta partials (the
    * rest), merges, and finalizes; the oracle is the full recompute, so
    * the merge path is proven equal to the rescan it replaces.
    *
    * This is the algebraic-aggregate property (SURVEY §2.1 row 9's
    * partial+final split) applied across TIME instead of across tasks —
    * the same mechanic Spark uses inside one job, reused for
    * incremental view maintenance. Works for any commutative monoid
    * (count/sum/min/max/HLL sketches); exact percentiles and distincts
    * don't merge, which is why their scale siblings are sketches
    * (q34/q73).
    */
  def incrementalAgg: Q = (s, d) => {
    val o = Tables.orders(s, d).select(
      col("o_orderpriority"),
      // complementary predicates via coalesce: a null date (none in the
      // corpora, but the split must not silently drop rows) lands in
      // the delta, not nowhere
      coalesce(year(col("o_orderdate")) <= 1996, lit(false)).as("is_base"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    def partials(df: DataFrame): DataFrame =
      df.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("cnt"), sum("price").as("psum"))
    partials(o.where(col("is_base")))
      .unionByName(partials(o.where(!col("is_base"))))
      .groupBy("o_orderpriority")
      .agg(sum("cnt").as("n"),
        sum("psum").cast("double").as("total"))
  }

  /** Snapshot diff — the batch CDC primitive: given yesterday's and
    * today's snapshot of a keyed table, classify every key as
    * added / removed / changed / unchanged in ONE full outer join, no
    * per-key history. Today's snapshot is derived deterministically
    * (drop keys ≡0 mod 97, restate status on keys ≡0 mod 5, insert
    * offset copies of keys ≡0 mod 101) so both engines can rebuild it;
    * the output is the per-action count plus an exact key checksum.
    *
    * Scale shape: one shuffle on the key co-partitions both snapshots;
    * the classification is a projection. This is the engine-level core
    * of MERGE/CDC systems — q67 (latest-per-key), q105 (SCD2) and q109
    * (MERGE apply) consume its classifications.
    */
  def snapshotDiff: Q = (s, d) => {
    val old = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        cents("o_totalprice").as("c"))
    val today = old.where(pmod(col("k"), lit(97)) =!= 0)
      .withColumn("st", when(pmod(col("k"), lit(5)) === 0, lit("X")).otherwise(col("st")))
      .unionByName(
        old.where(pmod(col("k"), lit(101)) === 0)
          .select((col("k") + 100000000L).as("k"), lit("N").as("st"), col("c")))
    old.select(col("k"), col("st").as("st_a"), col("c").as("c_a"))
      .join(today.select(col("k"), col("st").as("st_b"), col("c").as("c_b")),
        Seq("k"), "full_outer")
      .withColumn("action",
        when(col("st_b").isNull, "removed")
          .when(col("st_a").isNull, "added")
          .when(col("st_a") =!= col("st_b") || col("c_a") =!= col("c_b"), "changed")
          .otherwise("unchanged"))
      .groupBy("action")
      .agg(count(lit(1)).as("n"), sum("k").as("key_sum"))
  }

  /** Schema evolution: two parquet epochs with different schemas (the
    * second adds `o_orderpriority`) written by this query, read back as
    * ONE table via `mergeSchema` — missing columns null-fill, exactly
    * like a production lake where old files predate a column. The
    * aggregate buckets legacy rows under 'LEGACY', and the oracle
    * recomputes the same result from the source table, so a dropped or
    * misaligned column fails the hash.
    *
    * At 100 TB, schema merging is a FOOTER-level operation (Spark reads
    * parquet footers, not data, to union schemas) — the full-data cost
    * is unchanged; pinning the union schema in the table catalog removes
    * even the footer scan.
    */
  private val evoLock = new Object

  def schemaEvolution: Q = (s, d) => evoLock.synchronized {
    val root = s"${Tables.scratchDir}/evo-${d.replaceAll("[^a-zA-Z0-9.]", "_")}/orders"
    val o = Tables.orders(s, d).select(
      col("o_orderkey"), cents("o_totalprice").as("cents"),
      col("o_orderpriority"),
      coalesce(year(col("o_orderdate")) <= 1996, lit(false)).as("is_legacy"))
    o.where(col("is_legacy")).select("o_orderkey", "cents")
      .write.mode("overwrite").parquet(s"$root/epoch=1")
    o.where(!col("is_legacy")).select("o_orderkey", "cents", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$root/epoch=2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$root/epoch=1", s"$root/epoch=2")
      .groupBy(coalesce(col("o_orderpriority"), lit("LEGACY")).as("prio"))
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
  }

  /** Range-digest table checksums — the migration/replication validator:
    * per key-range bucket, a row count plus two ORDER-INDEPENDENT
    * digests (`bit_xor` of a 60-bit md5 row hash, and a modular sum of
    * the same hash) over a canonical integer projection of each row
    * (keys + exact cents — never raw floats, whose formatting is
    * engine-specific). Comparing two copies of a 100 TB table becomes
    * comparing #buckets tiny rows, and a mismatch names the key range
    * to re-copy. Commutative digests mean no sort anywhere: one scan,
    * one hash-aggregate; the modular sum stays overflow-free at any
    * bucket size (hash mod 1e9+7, summed over ≤ billions of rows).
    */
  def rangeDigest: Q = (s, d) =>
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        cents("l_quantity").as("qc"), cents("l_extendedprice").as("pc"))
      .withColumn("h", expr(
        "cast(conv(substring(md5(concat_ws('|', l_orderkey, l_linenumber, qc, pc)), 1, 15), 16, 10) as bigint)"))
      .withColumn("bucket", expr("l_orderkey div 2000"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("digest_xor"),
        sum(col("h") % 1000000007L).as("digest_sum"))

  /** Incremental JOIN-view maintenance — q130's aggregate IVM upgraded
    * to a two-sided join view: the revenue-per-segment view over
    * orders ⋈ customers is maintained from epoch deltas on BOTH sides
    * by the textbook delta-join expansion
    * `ΔA⋈C₀ ∪ A₀⋈ΔC ∪ ΔA⋈ΔC` merged into the old view partials —
    * the plan every materialized-view engine (Delta Live Tables,
    * Materialize) executes under the hood. Epochs split by key parity
    * so both deltas are live at every sf.
    *
    * Scale shape: four keyed equi joins, each touching one delta (at
    * production scale ΔA, ΔC ≪ A, C, so the three delta terms are the
    * only new work — yesterday's A₀⋈C₀ partials are a stored table,
    * computed here only because the oracle needs the full answer).
    */
  def deltaJoinView: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), cents("o_totalprice").as("c"),
        (col("o_orderkey") % 2 === 0).as("is_base"))
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_mktsegment"),
        (col("c_custkey") % 2 === 0).as("is_base"))
    def view(ord: DataFrame, cu: DataFrame): DataFrame =
      ord.join(cu, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("cnt"), sum("c").as("rev"))
    val (o0, dO) = (o.where(col("is_base")), o.where(!col("is_base")))
    val (c0, dC) = (cust.where(col("is_base")), cust.where(!col("is_base")))
    view(o0, c0)
      .unionByName(view(dO, c0))
      .unionByName(view(o0, dC))
      .unionByName(view(dO, dC))
      .groupBy("c_mktsegment")
      .agg(sum("cnt").as("n_orders"), sum("rev").as("rev_cents"))
  }

  /** Right-to-erasure impact audit: given a deterministic forget-set of
    * users (user_id % 13 — the erasure request queue), count the rows
    * each table would lose, INCLUDING the cascade (lineitem rows reach
    * the subject only through their orders). The pre-flight report a
    * GDPR/CCPA deletion job emits before touching anything: per table,
    * rows to purge and distinct subjects represented.
    *
    * Scale shape: the forget-set is an aggregate-sized dimension
    * broadcast into per-table semi-join-shaped probes; the cascade is
    * one extra keyed join through orders. Output is |tables| rows.
    */
  def erasureAudit: Q = (s, d) => {
    val forget = Tables.events(s, d).select("user_id").distinct()
      .where(col("user_id") % 13 === 0)
    def report(tbl: String, df: DataFrame, subject: String): DataFrame =
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(col(subject)).as("n_subjects"))
        .select(lit(tbl).as("tbl"), col("n_rows"), col("n_subjects"))
    val ev = Tables.events(s, d).join(broadcast(forget), "user_id")
    val cust = Tables.customer(s, d)
      .join(broadcast(forget), col("c_custkey") === col("user_id"))
    val ord = Tables.orders(s, d)
      .join(broadcast(forget), col("o_custkey") === col("user_id"))
    val li = Tables.lineitem(s, d)
      .join(ord.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
    report("events", ev, "user_id")
      .unionAll(report("customer", cust, "c_custkey"))
      .unionAll(report("orders", ord, "o_custkey"))
      .unionAll(report("lineitem", li, "o_custkey"))
  }

  /** Open-order aging report: orders still open (status 'O') bucketed
    * by age in 30-day bins against the corpus's latest order date —
    * the receivables/backlog aging table every operations dashboard
    * carries, with exact open-value cents per bucket.
    *
    * Scale shape: the reference date is a single-row aggregate fetched
    * driver-side and inlined as a literal (q156's rule — a one-row
    * cross join would plan a BNLJ); the report is then one pushed
    * filter + one hash aggregate to |buckets| rows. `o_orderdate` is
    * TIMESTAMP_NTZ — fetched via the DATE cast (q183's lesson:
    * unix_micros/getTimestamp refuse NTZ).
    */
  def orderAging: Q = (s, d) => {
    val ref = Tables.orders(s, d)
      .selectExpr("cast(max(o_orderdate) as date) as m").head().getDate(0)
    Tables.orders(s, d).where(col("o_orderstatus") === "O")
      .select(col("o_orderkey"),
        expr(s"cast(datediff(date'$ref', cast(o_orderdate as date)) as bigint)")
          .as("age_days"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .withColumn("bucket", expr("age_days div 30"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_orders"), sum("cents").as("open_cents"),
        min("age_days").as("min_age"), max("age_days").as("max_age"))
  }

  val queries: Map[String, Q] = Map(
    "q220_order_aging" -> orderAging,
    "q218_erasure_audit" -> erasureAudit,
    "q181_delta_join_view" -> deltaJoinView,
    "q158_range_digest" -> rangeDigest,
    "q130_incremental_agg" -> incrementalAgg,
    "q134_snapshot_diff" -> snapshotDiff,
    "q135_schema_evolution" -> schemaEvolution)

  val oracles: Map[String, String] = Map(
    "q220_order_aging" ->
      """WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS m FROM orders)
        |SELECT CAST(date_diff('day', CAST(o_orderdate AS DATE), m) // 30
        |    AS BIGINT) AS bucket,
        |  count(*) AS n_orders,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS open_cents,
        |  CAST(min(date_diff('day', CAST(o_orderdate AS DATE), m)) AS BIGINT)
        |    AS min_age,
        |  CAST(max(date_diff('day', CAST(o_orderdate AS DATE), m)) AS BIGINT)
        |    AS max_age
        |FROM orders CROSS JOIN ref
        |WHERE o_orderstatus = 'O' GROUP BY 1""".stripMargin,
    "q218_erasure_audit" ->
      """WITH f AS (SELECT DISTINCT user_id FROM events WHERE user_id % 13 = 0)
        |SELECT 'events' AS tbl, count(*) AS n_rows,
        |  count(DISTINCT user_id) AS n_subjects
        |FROM events JOIN f USING (user_id)
        |UNION ALL
        |SELECT 'customer', count(*), count(DISTINCT c_custkey)
        |FROM customer JOIN f ON c_custkey = user_id
        |UNION ALL
        |SELECT 'orders', count(*), count(DISTINCT o_custkey)
        |FROM orders JOIN f ON o_custkey = user_id
        |UNION ALL
        |SELECT 'lineitem', count(*), count(DISTINCT o_custkey)
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |              JOIN f ON o_custkey = user_id""".stripMargin,
    // the full join recompute the four-term delta expansion must equal
    "q181_delta_join_view" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |    AS BIGINT) AS rev_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "q158_range_digest" ->
      """WITH h AS (
        |  SELECT l_orderkey // 2000 AS bucket,
        |    CAST('0x' || substr(md5(concat_ws('|', l_orderkey, l_linenumber,
        |      CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT),
        |      CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))), 1, 15)
        |      AS BIGINT) AS h
        |  FROM lineitem)
        |SELECT bucket, count(*) AS n_rows, bit_xor(h) AS digest_xor,
        |  CAST(sum(h % 1000000007) AS BIGINT) AS digest_sum
        |FROM h GROUP BY bucket""".stripMargin,
    // the full recompute the merge path must equal
    "q130_incremental_agg" ->
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q134_snapshot_diff" ->
      """WITH old AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
        |  FROM orders),
        |today AS (
        |  SELECT k, CASE WHEN k % 5 = 0 THEN 'X' ELSE st END AS st, c
        |  FROM old WHERE k % 97 <> 0
        |  UNION ALL
        |  SELECT k + 100000000, 'N', c FROM old WHERE k % 101 = 0),
        |diff AS (
        |  SELECT coalesce(a.k, b.k) AS k,
        |    CASE WHEN b.k IS NULL THEN 'removed'
        |         WHEN a.k IS NULL THEN 'added'
        |         WHEN a.st <> b.st OR a.c <> b.c THEN 'changed'
        |         ELSE 'unchanged' END AS action
        |  FROM old a FULL OUTER JOIN today b ON a.k = b.k)
        |SELECT action, count(*) AS n, CAST(sum(k) AS BIGINT) AS key_sum
        |FROM diff GROUP BY action""".stripMargin,
    "q135_schema_evolution" ->
      """SELECT CASE WHEN coalesce(year(o_orderdate) <= 1996, FALSE)
        |            THEN 'LEGACY' ELSE o_orderpriority END AS prio,
        |  count(*) AS n,
        |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM orders GROUP BY 1""".stripMargin)
}
