package graft.mr

import org.apache.spark.sql.{Dataset, Encoder}

/** Layer A — the faithful, typed MapReduce API.
  *
  * Spark-native re-expression of the reference contract
  * (`MapReduceClient.h:55-65`, `MapReduceFramework.h:18-24`):
  *
  *  - `map` may emit any number of `(K2, V2)` pairs per input record
  *    (`MapReduceClient.h:57-58`) — i.e. it is a flatMap; filters emit 0,
  *    projections emit 1, expansions emit N.
  *  - `reduce` receives ALL values of one key at once
  *    (`MapReduceClient.h:61-64`) and may emit any number of `(K3, V3)`
  *    pairs — i.e. flatMapGroups.
  *  - Output order is unspecified, mirroring the reference's
  *    mutex-append output (`MapReduceFramework.cpp:181-184`).
  *
  * The reference's phase machine maps 1:1 onto the Spark physical plan:
  * per-thread map + sort (`MapReduceFramework.cpp:80-96`) → Spark map
  * tasks; barrier + single-threaded shuffle (`MapReduceFramework.cpp:
  * 100-133,162`) → the `Exchange hashpartitioning` stage boundary;
  * work-stealing reduce (`MapReduceFramework.cpp:135-149`) → reduce-side
  * tasks over grouped iterators. Grouping is by key VALUE equality (the
  * declared contract), not the reference implementation's accidental
  * pointer identity (see SURVEY.md §2.1 fidelity note).
  *
  * Scale note: `reduce` streams one key's values as an `Iterator` — the
  * engine never materializes a group. Clients that need algebraic
  * aggregation at 100 TB should use [[MapReduce.runAggregate]], which
  * gets Spark's partial (map-side) aggregation, something the reference's
  * model cannot express (its clients hand-roll map-side combines,
  * `SampleClient.cpp:34-49`).
  */
object MapReduce {

  /** The reference's explicit parallelism degree
    * (`startMapReduceJob`'s `multiThreadLevel`,
    * `MapReduceFramework.h:18-20`) mapped to Spark: n > 0 repartitions
    * the input so the MAP phase runs exactly n tasks; n <= 0 (the
    * default) keeps the source's own partitioning — the session decides,
    * which is what a 100 TB deployment wants. Reduce-side width stays
    * `spark.sql.shuffle.partitions` (the reference reuses its one thread
    * pool for both phases; Spark sizes the phases independently).
    * Results are independent of n — pinned by spec.
    */
  private def withLevel[I](input: Dataset[I], multiThreadLevel: Int): Dataset[I] =
    if (multiThreadLevel > 0) input.repartition(multiThreadLevel) else input

  /** Full-generality job: flatMap → group-by-key → flatMapGroups. */
  def run[I, K2, V2, K3, V3](input: Dataset[I], multiThreadLevel: Int = 0)(
      map: I => IterableOnce[(K2, V2)])(
      reduce: (K2, Iterator[V2]) => IterableOnce[(K3, V3)])(implicit
      e2: Encoder[(K2, V2)],
      ek: Encoder[K2],
      e3: Encoder[(K3, V3)]): Dataset[(K3, V3)] =
    withLevel(input, multiThreadLevel)
      .flatMap(map)                 // MAP + emit2 (cpp:84, 172-175)
      .groupByKey(_._1)             // SHUFFLE: group-by-key (cpp:100-133)
      .flatMapGroups((k: K2, it: Iterator[(K2, V2)]) => reduce(k, it.map(_._2)))

  /** Async submission with the reference's full job lifecycle
    * (`startMapReduceJob`/`getJobState`/`waitForJob`/`closeJobHandle`) —
    * see [[JobHandle]].
    */
  def submit[I, K2, V2, K3, V3](input: Dataset[I], multiThreadLevel: Int = 0)(
      map: I => IterableOnce[(K2, V2)])(
      reduce: (K2, Iterator[V2]) => IterableOnce[(K3, V3)])(implicit
      e2: Encoder[(K2, V2)],
      ek: Encoder[K2],
      e3: Encoder[(K3, V3)]): JobHandle[Array[(K3, V3)]] =
    JobHandle.launch(withLevel(input, multiThreadLevel))(map)(reduce)

  /** [[submit]] with a parquet sink instead of the collect buffer — the
    * output path for results that must not transit the driver. Same
    * lifecycle handle; resolves to the written row count.
    */
  def submitWrite[I, K2, V2, K3, V3](input: Dataset[I], path: String,
      multiThreadLevel: Int = 0)(
      map: I => IterableOnce[(K2, V2)])(
      reduce: (K2, Iterator[V2]) => IterableOnce[(K3, V3)])(implicit
      e2: Encoder[(K2, V2)],
      ek: Encoder[K2],
      e3: Encoder[(K3, V3)]): JobHandle[Long] =
    JobHandle.launchWrite(withLevel(input, multiThreadLevel), path)(map)(reduce)

  /** Algebraic fast path: when reduce is a commutative/associative merge,
    * run it as `reduceGroups` so Spark applies partial aggregation before
    * the shuffle (the upgrade over the reference the 100 TB target needs).
    */
  def runAggregate[I, K2, V2](input: Dataset[I], multiThreadLevel: Int = 0)(
      map: I => IterableOnce[(K2, V2)])(
      merge: (V2, V2) => V2)(implicit
      e2: Encoder[(K2, V2)],
      ek: Encoder[K2],
      ev: Encoder[V2]): Dataset[(K2, V2)] =
    withLevel(input, multiThreadLevel)
      .flatMap(map)
      .groupByKey(_._1)
      .mapValues(_._2)
      .reduceGroups(merge)
}
