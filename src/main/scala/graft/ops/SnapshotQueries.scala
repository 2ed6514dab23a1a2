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
    // fanOut: the md5 row hash is per-row compute heavier than the
    // scan itself; on the single-row-group test files the scan yields
    // ONE task, serializing 600k digests through one core (measured
    // TimeQ-min 1.35 → 1.16 s at sf0.1/local[32] — the digest stage
    // parallelizes, the aggregate's shuffle stays tiny). At production
    // file counts the helper is a no-op by construction.
    Tables.fanOut(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          cents("l_quantity").as("qc"), cents("l_extendedprice").as("pc")),
      col("l_orderkey"))
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

  /** Declarative data-quality constraint audit — the Deequ/
    * Great-Expectations-shaped manifest a pipeline emits before
    * promoting a snapshot: per (table, column, rule), rows checked,
    * rows violating, and the pass verdict. The rule set mixes
    * invariants this corpus satisfies (completeness, key uniqueness,
    * referential integrity, bounds) with screens that FIRE on real
    * data (a price plausibility ceiling, a discount policy cap, an
    * allow-listed language set) — an audit whose violations are all
    * zero is untested wiring.
    *
    * Scale shape: every per-column rule on a table fuses into ONE
    * conditional-aggregate pass over that table (4 scans for 11
    * rules — the `stack` unpivots the single agg row into rule rows);
    * referential integrity is the only rule that needs a second
    * relation and costs one keyed equi-join (null-probe LEFT join on
    * the orders key). Output is |rules| rows. At 100 TB the audit
    * rides the same scan the ingest job already pays, which is the
    * whole point of fusing rules instead of running one query per
    * rule.
    */
  def constraintAudit: Q = (s, d) => {
    def unpivot(agg: DataFrame, rules: Seq[(String, String, String, String)]): DataFrame = {
      val cells = rules.map { case (t, c, r, v) =>
        s"'$t', '$c', '$r', n_rows, $v"
      }.mkString(", ")
      agg.selectExpr(
        s"stack(${rules.size}, $cells) AS (tbl, col, rule, n_checked, n_violations)")
    }
    def cnt(cond: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(when(cond, 1L).otherwise(0L))
    val ev = unpivot(
      Tables.events(s, d).agg(
        count(lit(1)).as("n_rows"),
        cnt(col("user_id").isNull).as("v_uid_null"),
        cnt(col("value").isNull).as("v_val_null"),
        cnt(col("value") < 0).as("v_val_neg"),
        (count(lit(1)) - countDistinct(col("event_id"))).as("v_eid_dup")),
      Seq(("events", "user_id", "not_null", "v_uid_null"),
        ("events", "value", "not_null", "v_val_null"),
        ("events", "value", "non_negative", "v_val_neg"),
        ("events", "event_id", "unique", "v_eid_dup")))
    val doc = unpivot(
      Tables.documents(s, d).agg(
        count(lit(1)).as("n_rows"),
        cnt(col("text").isNull || col("text") === "").as("v_text_empty"),
        cnt(length(col("text")) =!= col("n_chars")).as("v_nchars"),
        cnt(!col("lang").isin("en", "de", "fr", "es")).as("v_lang")),
      Seq(("documents", "text", "not_empty", "v_text_empty"),
        ("documents", "n_chars", "equals_length_text", "v_nchars"),
        ("documents", "lang", "in_allowed_set", "v_lang")))
    val ord = unpivot(
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("v_key_dup"),
        cnt(col("o_totalprice") > 400000).as("v_price_ceiling"),
        cnt(!col("o_orderstatus").isin("O", "F", "P")).as("v_status")),
      Seq(("orders", "o_orderkey", "unique", "v_key_dup"),
        ("orders", "o_totalprice", "ceiling_400000", "v_price_ceiling"),
        ("orders", "o_orderstatus", "in_allowed_set", "v_status")))
    val li = unpivot(
      Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        cnt(!col("l_quantity").between(1, 50)).as("v_qty_range"),
        cnt(col("l_discount") > 0.08).as("v_disc_cap"),
        cnt(col("l_extendedprice") <= 0).as("v_price_pos")),
      Seq(("lineitem", "l_quantity", "between_1_50", "v_qty_range"),
        ("lineitem", "l_discount", "cap_0_08", "v_disc_cap"),
        ("lineitem", "l_extendedprice", "positive", "v_price_pos")))
    // referential integrity: the one rule that crosses relations —
    // null-probe LEFT join so checked + violating come from one pass
    val fk = unpivot(
      Tables.lineitem(s, d).select(col("l_orderkey"))
        .join(Tables.orders(s, d).select(col("o_orderkey")).distinct(),
          col("l_orderkey") === col("o_orderkey"), "left")
        .agg(count(lit(1)).as("n_rows"),
          cnt(col("o_orderkey").isNull).as("v_fk")),
      Seq(("lineitem", "l_orderkey", "fk_orders", "v_fk")))
    ev.unionByName(doc).unionByName(ord).unionByName(li).unionByName(fk)
      .withColumn("pass", col("n_violations") === 0L)
  }

  val queries: Map[String, Q] = Map(
    "q265_constraint_audit" -> constraintAudit,
    "q220_order_aging" -> orderAging,
    "q218_erasure_audit" -> erasureAudit,
    "q181_delta_join_view" -> deltaJoinView,
    "q158_range_digest" -> rangeDigest,
    "q130_incremental_agg" -> incrementalAgg,
    "q134_snapshot_diff" -> snapshotDiff,
    "q135_schema_evolution" -> schemaEvolution)

  val oracles: Map[String, String] = Map(
    "q265_constraint_audit" ->
      """WITH ev AS (SELECT count(*) n,
        |  CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) uid_null,
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) val_null,
        |  CAST(sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS BIGINT) val_neg,
        |  count(*) - count(DISTINCT event_id) eid_dup FROM events),
        |doc AS (SELECT count(*) n,
        |  CAST(sum(CASE WHEN text IS NULL OR text = '' THEN 1 ELSE 0 END) AS BIGINT) t_empty,
        |  CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT) nch,
        |  CAST(sum(CASE WHEN lang NOT IN ('en','de','fr','es') THEN 1 ELSE 0 END) AS BIGINT) lng
        |  FROM documents),
        |ord AS (SELECT count(*) n, count(*) - count(DISTINCT o_orderkey) key_dup,
        |  CAST(sum(CASE WHEN o_totalprice > 400000 THEN 1 ELSE 0 END) AS BIGINT) price_c,
        |  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) st
        |  FROM orders),
        |li AS (SELECT count(*) n,
        |  CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS BIGINT) qty,
        |  CAST(sum(CASE WHEN l_discount > 0.08 THEN 1 ELSE 0 END) AS BIGINT) disc,
        |  CAST(sum(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) price_p
        |  FROM lineitem),
        |fk AS (SELECT count(*) n,
        |  CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) v
        |  FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
        |    ON l.l_orderkey = o.o_orderkey),
        |rules AS (
        |  SELECT 'events' tbl, 'user_id' AS "col", 'not_null' AS "rule", n n_checked, uid_null n_violations FROM ev
        |  UNION ALL SELECT 'events', 'value', 'not_null', n, val_null FROM ev
        |  UNION ALL SELECT 'events', 'value', 'non_negative', n, val_neg FROM ev
        |  UNION ALL SELECT 'events', 'event_id', 'unique', n, eid_dup FROM ev
        |  UNION ALL SELECT 'documents', 'text', 'not_empty', n, t_empty FROM doc
        |  UNION ALL SELECT 'documents', 'n_chars', 'equals_length_text', n, nch FROM doc
        |  UNION ALL SELECT 'documents', 'lang', 'in_allowed_set', n, lng FROM doc
        |  UNION ALL SELECT 'orders', 'o_orderkey', 'unique', n, key_dup FROM ord
        |  UNION ALL SELECT 'orders', 'o_totalprice', 'ceiling_400000', n, price_c FROM ord
        |  UNION ALL SELECT 'orders', 'o_orderstatus', 'in_allowed_set', n, st FROM ord
        |  UNION ALL SELECT 'lineitem', 'l_quantity', 'between_1_50', n, qty FROM li
        |  UNION ALL SELECT 'lineitem', 'l_discount', 'cap_0_08', n, disc FROM li
        |  UNION ALL SELECT 'lineitem', 'l_extendedprice', 'positive', n, price_p FROM li
        |  UNION ALL SELECT 'lineitem', 'l_orderkey', 'fk_orders', n, v FROM fk)
        |SELECT tbl, "col", "rule", n_checked, n_violations,
        |  (n_violations = 0) AS pass
        |FROM rules""".stripMargin,
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
