package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries live in category modules under `graft.ops`; this object is the
  * flat registry the driver consumes. Every key in [[queries]] with an
  * entry in [[oracleSql]] is hash-checked against DuckDB on the same
  * parquet at sf0.01; keys without an oracle get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference sample client's character count
    * (`Sample Client/SampleClient.cpp:32-66`) over real data.
    */
  def entry(spark: SparkSession): DataFrame =
    ops.CoreQueries.charCountDf(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.CoreQueries.queries ++
      ops.ExtraQueries.queries ++
      ops.AnalyticsQueries.queries ++
      ops.BehaviorQueries.queries ++
      ops.GraphQueries.queries ++
      ops.SubqueryQueries.queries ++
      ops.SnapshotQueries.queries ++
      ops.AsOf.queries ++
      ops.RangeJoin.queries ++
      ops.Scale.queries ++
      text.TextQueries.queries ++
      dedup.DedupQueries.queries ++
      sim.SimQueries.queries ++
      multimodal.Multimodal.queries ++
      streaming.Streams.queries ++
      store.StoreQueries.queries

  /** The two exact all-pairs correctness baselines: kept in [[queries]]
    * (and so in the driver's oracle gate) but excluded from the bench
    * path — their registered scale siblings (q42 MinHash-LSH, q58
    * bucketed embedding pairs) are what gets benchmarked. Both are also
    * size-gated in their modules so they cannot silently run at scale.
    */
  val exactBaselines: Set[String] =
    Set("q41_dedup_jaccard", "q44_embedding_pairs")

  /** Bench-path overrides for the sketch/ANN queries whose REGISTERED
    * form is the self-auditing `*Checked` variant (sketch + exact
    * reference + accuracy booleans, so the DuckDB oracle can hash-gate
    * an approximate operator). The audit recomputation is a correctness
    * harness, not part of the operator: in production (and at 100 TB)
    * only the sketch pipeline runs. [[Bench]] therefore times these raw
    * production forms, while [[Verify]] keeps serving the audited forms
    * to the driver's oracle. The specs pin both: each module's suite
    * asserts the audit booleans AND the raw form's own accuracy bounds.
    */
  def benchForms: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q34_approx_distinct" -> ops.ExtraQueries.approxDistinct,
    "q43_dedup_simhash" -> dedup.DedupQueries.simhash,
    "q46_knn_lsh" -> sim.SimQueries.knnLsh,
    "q234_knn_filtered" -> sim.SimQueries.knnLshFiltered,
    "q54_knn_ivf" -> sim.SimQueries.knnIvf,
    "q277_incremental_ivf" -> sim.SimQueries.incrementalIvf,
    "q279_erasure_ivf" -> sim.SimQueries.erasureIvf,
    "q280_compacted_ivf" -> sim.SimQueries.compactedIvf,
    "q292_stream_ivf_index" -> streaming.Streams.streamMaintainedIvfProbe,
    "q294_retrained_ivf" -> sim.SimQueries.retrainedIvf,
    "q296_erased_stream_ivf" -> streaming.Streams.erasedStreamIvfProbe,
    "q304_folded_stream_ivf" -> streaming.Streams.foldedStreamIvfProbe,
    "q312_erasure_folded_ivf" -> store.StoreQueries.erasureFoldedStreamIvfProbe,
    "q316_drift_aware_retrain" -> sim.SimQueries.driftAwareIvf,
    "q325_drift_loop_stream_ivf" -> streaming.Streams.driftLoopStreamIvfProbe,
    "q224_knn_pq" -> sim.SimQueries.knnPq,
    "q58_embedding_pairs_lsh" -> sim.SimQueries.embeddingPairsLsh,
    "q73_approx_percentiles" -> ops.ExtraQueries.approxPercentiles,
    "q79_ngram_topk_sketch" -> text.TextQueries.ngramTopKSketch,
    "q94_semdedup" -> sim.SimQueries.semDedup,
    "q213_semantic_decontam" -> sim.SimQueries.semanticDecontamLsh,
    "q137_hll_merge" -> ops.AnalyticsQueries.hllMergeDaily,
    "q231_cms_frequency" -> ops.AnalyticsQueries.cmsFrequency,
    "q178_kll_quantiles" -> ops.AnalyticsQueries.kllQuantiles,
    "q180_audience_overlap" -> ops.AnalyticsQueries.audienceOverlap,
    "q206_rolling_sketch" -> ops.BehaviorQueries.rollingDistinctSketch)

  /** What [[Bench]] measures: every registered query except the
    * O(n²)-by-construction oracle baselines, with the sketch queries'
    * audit forms swapped for their production forms ([[benchForms]]).
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    (queries -- exactBaselines) ++ benchForms

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    ops.CoreQueries.oracles ++
      ops.ExtraQueries.oracles ++
      ops.AnalyticsQueries.oracles ++
      ops.BehaviorQueries.oracles ++
      ops.GraphQueries.oracles ++
      ops.SubqueryQueries.oracles ++
      ops.SnapshotQueries.oracles ++
      ops.AsOf.oracles ++
      ops.RangeJoin.oracles ++
      ops.Scale.oracles ++
      text.TextQueries.oracles ++
      dedup.DedupQueries.oracles ++
      sim.SimQueries.oracles ++
      multimodal.Multimodal.oracles ++
      streaming.Streams.oracles ++
      store.StoreQueries.oracles
}
