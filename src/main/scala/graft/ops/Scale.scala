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
    * returns its path. Keyed by the source dir so different datasets/sf
    * never serve each other's data. Split out of the query body so a
    * benchmark can warm it up and measure only the pruned scan.
    */
  def ensurePartitionedOrders(s: SparkSession, d: String): String = {
    val path = s"${Tables.scratchDir}/graft-orders-by-year-${math.abs(d.hashCode)}"
    if (!new java.io.File(path, "_SUCCESS").exists()) {
      Tables.orders(s, d)
        .withColumn("o_year", year(col("o_orderdate")))
        .write.mode("overwrite").partitionBy("o_year").parquet(path)
    }
    path
  }


  /** Register bucketed copies of two tables and return the co-located
    * join: both sides pre-partitioned into the same bucket layout on the
    * join key, so the join itself needs NO shuffle (no Exchange in the
    * plan) — the pattern for repeatedly-joined 100 TB fact tables.
    * Buckets are written once per dataset dir and reused (table names
    * embed the dir hash so different sfs never collide).
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
  def ensureBucketedTables(s: SparkSession, d: String, buckets: Int = 8): String = {
    val suffix = math.abs(d.hashCode).toString
    def ensure(name: String, df: DataFrame, key: String): Unit =
      if (!s.catalog.tableExists(name)) {
        // the in-memory catalog forgets tables across JVMs but the
        // warehouse directory persists — clear any stale location first
        val wh = s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
        val loc = new java.io.File(wh, name)
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm))
            f.delete(): Unit
          }
          rm(loc)
        }
        df.write.bucketBy(buckets, key).sortBy(key)
          .mode("overwrite").format("parquet").saveAsTable(name)
      }
    ensure(s"orders_bkt_$suffix", Tables.orders(s, d), "o_custkey")
    ensure(s"customer_bkt_$suffix", Tables.customer(s, d), "c_custkey")
    suffix
  }

  /** Benchmark warmup hook: materialize every derived copy a registered
    * query reads (partitioned/bucketed tables, the V2-source TSV, the
    * ORC copy), so measured runs see only the query itself.
    */
  def warmDerived(s: SparkSession, d: String): Unit = {
    ensurePartitionedOrders(s, d): Unit
    ensureBucketedTables(s, d): Unit
    ExtraQueries.warmDerived(s, d)
  }

  /** Registry forms of the scale techniques, each with an exact oracle:
    * the salted aggregate must equal the plain group-by, the pruned scan
    * must equal the predicate form, the bucketed (shuffle-free) join must
    * equal the plain join — so the 100 TB mechanics are themselves
    * correctness-gated, not just plan-pinned in ScaleSpec.
    */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_salted_sum" -> ((s, d) =>
      saltedSum(Tables.lineitem(s, d), col("l_returnflag"), col("l_quantity"))),
    "q60_partition_pruned" -> (partitionPrunedScan(_, _)),
    "q61_bucketed_join" -> (bucketedJoin(_, _)))

  val oracles: Map[String, String] = Map(
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
        |GROUP BY c_mktsegment""".stripMargin)
}
