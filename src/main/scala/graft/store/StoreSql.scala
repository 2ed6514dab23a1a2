package graft.store

import org.apache.spark.sql.SparkSession

import graft.store.ManifestStore._

/** The SQL surface of the manifest-store layer: one call registers a
  * committed store — and its metadata tables — as temp views, so any
  * Spark SQL user queries the table format with plain SQL (`SELECT ...
  * FROM docstats`, `... FROM docstats_snapshots`) the way Iceberg
  * exposes `tbl`, `tbl$snapshots`, `tbl$files` and Delta exposes
  * DESCRIBE HISTORY.
  *
  * Deliberately VIEWS, not a custom DSv2 connector: the store read is
  * already a declarative DataFrame plan over parquet members, so a view
  * keeps Spark's whole native scan path — vectorized parquet reader,
  * filter pushdown, column pruning, row-group skipping — intact through
  * the view boundary (ManifestStoreSpec pins PushedFilters and a pruned
  * ReadSchema through a registered view). A hand-rolled DSv2 reader
  * would have to re-implement exactly that machinery to break even.
  * Member-level sidecar pruning (range/bloom) stays available through
  * the ranged/keyed entry points; inside a member, the pushed filters
  * do the same work at row-group granularity for free.
  */
object StoreSql {

  /** Register `name` (the committed snapshot), `name_snapshots`,
    * `name_members` (of the head version), `name_branches`, and one
    * `name_v<N>` time-travel view per RETAINED version. View names use
    * underscores — Spark temp view identifiers reject `$` — and
    * re-registration replaces (the view captures the plan over the
    * CURRENT head; re-register after commits, exactly like refreshing
    * a catalog entry).
    */
  def registerStoreViews(s: SparkSession, name: String,
      root: java.nio.file.Path, upsertKey: Option[String] = None): Unit = {
    val head = committedManifest(root)
      .getOrElse(sys.error(s"cannot register views over an empty store: $root"))
    val members = manifestMembers(root, head)
    // the bare-name view is the untagged relation; a pure multi-rel
    // store gets only its per-relation views (unioning relations of
    // different schemas under one name would be nonsense)
    if (members.forall(l => relTagOf(l) == ""))
      manifestSnapshot(s, root, upsertKey)
        .foreach(_.createOrReplaceTempView(name))
    metaSnapshots(s, root).createOrReplaceTempView(s"${name}_snapshots")
    metaMembers(s, root, head).createOrReplaceTempView(s"${name}_members")
    metaBranches(s, root).createOrReplaceTempView(s"${name}_branches")
    if (members.forall(l => relTagOf(l) == ""))
      metaSnapshots(s, root).select("version").collect().map(_.getLong(0))
        .foreach { v =>
          manifestSnapshotAt(s, root, v, upsertKey)
            .createOrReplaceTempView(s"${name}_v$v")
        }
    // a multi-relation store additionally registers one view per
    // relation (`name_<rel>`) — the main view stays the untagged
    // relation if one exists, matching the programmatic readers
    members.map(relTagOf).distinct.filter(_.nonEmpty)
      .foreach { rel =>
        manifestSnapshotRel(s, root, rel)
          .foreach(_.createOrReplaceTempView(s"${name}_$rel"))
      }
  }
}
