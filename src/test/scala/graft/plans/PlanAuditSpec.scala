package graft.plans

import graft.{SparkEntry, SparkSpec}

/** Fleet-wide plan lint: EVERY registered query must plan without a
  * cartesian product or nested-loop join — the two shapes that turn a
  * 100 TB run into |L|x|R| work. Per-query specs pin the interesting
  * plans individually; this audit guarantees no future query slips a
  * quadratic join into the registry unnoticed.
  */
class PlanAuditSpec extends SparkSpec {

  /** Queries allowed to skip the audit: the stateful replays execute a
    * real stream on invocation (their plans are audited by their own
    * specs and their cost bounded by their oracles), and the two exact
    * all-pairs baselines are size-gated, bench-excluded correctness
    * oracles whose pairwise shape is their documented purpose.
    */
  private val skip: Set[String] = Set(
    "q71_stateful_totals", "q89_stateful_totals_tws", "q233_stream_upsert")

  /** q45 brute kNN is |Q|x|corpus| BY DEFINITION (exact scores against
    * a handful of broadcast query vectors over every row) — the
    * BroadcastNestedLoopJoin over the tiny broadcast side IS the right
    * plan. The six registered ANN AUDIT forms (q46/q54/q224/q58/q94/q213)
    * embed the same sanctioned shape: their approximate core (the
    * bench-path form in SparkEntry.benchForms) is pinned BNLJ-free by
    * SimSpec's plan test, and the audit stage grades it against
    * knnBrute / a bounded anchored broadcast probe (≤ 1000 anchors by
    * construction — linear, not quadratic, in the corpus).
    */
  private val allowPairwise: Set[String] =
    SparkEntry.exactBaselines + "q45_knn_brute" + "q213_semantic_decontam" +
      "q46_knn_lsh" + "q54_knn_ivf" + "q224_knn_pq" +
      "q58_embedding_pairs_lsh" + "q94_semdedup" + "q277_incremental_ivf" +
      "q279_erasure_ivf" + "q280_compacted_ivf" + "q292_stream_ivf_index" +
      "q294_retrained_ivf" + "q296_erased_stream_ivf" +
      "q304_folded_stream_ivf" + "q312_erasure_folded_ivf" +
      "q316_drift_aware_retrain" + "q325_drift_loop_stream_ivf"

  /** The bench path must never pay for audit machinery: every
    * bench-form override must (a) override a registered query, (b) not
    * plan a quadratic join (the production sketch forms are exactly the
    * plans whose BNLJ-freedom the audit exemptions above assume), and
    * (c) ship a flat schema like everything else Bench writes.
    */
  test("bench-form overrides are registered, quadratic-free, flat") {
    val unknown = SparkEntry.benchForms.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"benchForms not in the registry: $unknown")
    val offenders = SparkEntry.benchForms.toSeq.sortBy(_._1)
      .flatMap { case (name, fn) =>
        val df = fn(spark, sf)
        val plan = df.queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
        val nonFlat = df.schema.fields.exists(f =>
          f.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] ||
            f.dataType.isInstanceOf[org.apache.spark.sql.types.MapType] ||
            f.dataType.isInstanceOf[org.apache.spark.sql.types.StructType])
        val all = bad ++ (if (nonFlat) Seq("non-flat schema") else Nil)
        if (all.isEmpty) None else Some(s"$name: ${all.mkString(", ")}")
      }
    assert(offenders.isEmpty, s"bench-form violations:\n${offenders.mkString("\n")}")
  }

  test("no registered query plans a cartesian or nested-loop join") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) || allowPairwise(n) }
      .flatMap { case (name, fn) =>
        val plan = fn(spark, sf).queryExecution.executedPlan.toString
        val bad = Seq("CartesianProduct", "BroadcastNestedLoopJoin").filter(plan.contains)
        if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(", ")}")
      }
    assert(offenders.isEmpty, s"quadratic join shapes in:\n${offenders.mkString("\n")}")
  }

  /** The q65/q111 rule, mechanized: the driver's correctness harness
    * sorts result rows in pandas, and an array/map/struct output column
    * throws `unhashable type: numpy.ndarray` — a harness crash, not a
    * mismatch. Every registered query must ship a FLAT final schema
    * (join arrays into strings before returning).
    */
  test("no registered query's final schema contains an array/map/struct column") {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (n, _) => skip(n) }
      .flatMap { case (name, fn) =>
        val bad = fn(spark, sf).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType] ||
            f.dataType.isInstanceOf[MapType] ||
            f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.simpleString}"
        }
        if (bad.isEmpty) None else Some(s"$name: ${bad.mkString(", ")}")
      }
    assert(offenders.isEmpty, s"non-flat output columns in:\n${offenders.mkString("\n")}")
  }
}
